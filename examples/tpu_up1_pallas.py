"""On-chip benchmark of the decoder's Pallas 3x3 VALID conv
(``ops/phase_conv.conv3x3_valid``) vs XLA's native conv lowering, at the
three half-res phase-conv shapes of the PSPNet decoder (batch 64, bf16):

    up1:  24x24 x1024 -> 1024 (4 phases x 256)
    up2:  48x48 x 256 ->  256 (4 phases x 64)
    up3:  96x96 x  64 ->  256 (4 phases x 64)

plus the integrated ``phase_upsample_conv3x3`` stages under both backends.
Round-2b probed four XLA formulations of up1 at a shared ~5 ms floor
(docs/PERF.md); theoretical MXU floor at that shape is ~3.5 ms on v5e.

Usage: python examples/tpu_up1_pallas.py [--iters 30] [--batch 64]
Writes one JSON dict to --out (default /tmp/up1_pallas.json).
"""

import argparse
import json
import math
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default="/tmp/up1_pallas.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from densefusion_tpu.ops.phase_conv import conv3x3_valid
    from densefusion_tpu.models.layers import phase_upsample_conv3x3

    results = {}

    def record(k, v):
        if isinstance(v, float) and not math.isfinite(v):
            v = repr(v)  # keep the JSON standard-parseable
        results[k] = v
        print(k, v, flush=True)

    def timeit(tag, fn, *arrs, iters=None):
        iters = iters or args.iters
        t0 = time.perf_counter()
        r = fn(*arrs)
        _ = np.asarray(r.reshape(-1)[:1], np.float32)  # scalar sync only
        record(tag + "_compile_s", round(time.perf_counter() - t0, 1))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*arrs)
        _ = np.asarray(r.reshape(-1)[:1], np.float32)
        dt = (time.perf_counter() - t0) / iters * 1e3
        record(tag + "_ms", round(dt, 3))
        return r

    rng = np.random.default_rng(0)
    B = args.batch
    stages = {
        "up1": (24, 1024, 1024),
        "up2": (48, 256, 256),
        "up3": (96, 64, 256),
    }

    for name, (hw, cin, cout) in stages.items():
        xp = jnp.asarray(rng.standard_normal((B, hw + 2, hw + 2, cin)),
                         jnp.bfloat16)
        pk = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.02,
                         jnp.bfloat16)
        ref = None
        for backend in ("xla", "pallas"):
            fn = jax.jit(lambda xp, pk, b=backend: conv3x3_valid(
                xp, pk, backend=b))
            try:
                got = timeit(f"{name}_{backend}", fn, xp, pk)
            except Exception as e:  # noqa: BLE001
                record(f"{name}_{backend}_error", repr(e)[:500])
                continue
            if ref is None:
                ref = got
            else:
                # identical bf16 bias-free outputs; f32 compare
                a = np.asarray(got, np.float32)
                b = np.asarray(ref, np.float32)
                denom = max(float(np.max(np.abs(b))), 1e-30)
                record(f"{name}_maxerr_rel",
                       float(np.max(np.abs(a - b))) / denom)

    # integrated upsample stages (replicate border, both backends)
    for name, (hw, cin, cout4) in stages.items():
        cout = cout4 // 4
        x = jnp.asarray(rng.standard_normal((B, hw, hw, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.02,
                        jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.bfloat16)
        for backend in ("xla", "pallas"):
            fn = jax.jit(lambda x, k, bias, b=backend: phase_upsample_conv3x3(
                x, k, bias, border="replicate", conv_backend=b))
            try:
                timeit(f"stage_{name}_{backend}", fn, x, k, bias)
            except Exception as e:  # noqa: BLE001
                record(f"stage_{name}_{backend}_error", repr(e)[:500])

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("DONE")


if __name__ == "__main__":
    main()
