#!/usr/bin/env python
"""Thin wrapper: see densefusion_tpu.cli.train (layout parity with the
reference's tools/ entry points)."""
from densefusion_tpu.cli.train import main

if __name__ == "__main__":
    main()
