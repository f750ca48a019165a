#!/usr/bin/env python
"""Thin wrapper: see densefusion_tpu.cli.eval_linemod (layout parity with the
reference's tools/ entry points)."""
from densefusion_tpu.cli.eval_linemod import main

if __name__ == "__main__":
    main()
