"""Export a checkpoint's inference program as a serialized StableHLO blob.

The artifact contains the whole estimate+refine graph with parameters baked
in; it loads with only jax installed (``densefusion_tpu.export.load_exported``)
on any lowered platform. Fixed batch size per artifact (export several for a
size ladder).

Example::

    python -m densefusion_tpu.cli.export_stablehlo \
        --checkpoint trained_models/linemod/checkpoint_best_refine \
        --batch 8 --out posenet_b8.shlo
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iterations", type=int, default=2,
                   help="refinement iterations baked into the graph")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms (default: cpu tpu)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from densefusion_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from densefusion_tpu.export import export_inference

    if not os.path.isdir(args.checkpoint):
        raise SystemExit(
            f"error: checkpoint directory not found: {args.checkpoint!r}")
    blob = export_inference(
        args.checkpoint, batch=args.batch, refine_iters=args.iterations,
        bf16=args.bf16,
        platforms=tuple(args.platforms) if args.platforms else None)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported -> {args.out} ({len(blob) / 2 ** 20:.1f} MiB, "
          f"batch={args.batch}, iterations={args.iterations})")


if __name__ == "__main__":
    main()
