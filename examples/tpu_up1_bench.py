"""up1 / dilated-conv formulation probes.

up1 (1024->256 over 24->48 upsample) is the most expensive decoder stage
(7.5 ms/batch-64, ~47% MXU eff). Compare: resize+conv (current), phase
conv, and phase conv with pre-composed kernels. Also probe the trunk's
dilation-4 stage-4 conv vs a 9-shift matmul formulation.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/up1_bench.json")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()
    results = {}

    import jax
    import jax.numpy as jnp
    from densefusion_tpu.models.layers import (
        phase_upsample_conv3x3, phase_conv_phases, resize_bilinear,
    )

    def record(k, v):
        results[k] = v
        print(k, v, flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    t0 = time.time()
    _ = np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    record("session_setup_s", round(time.time() - t0, 1))

    b = args.batch
    bf = jnp.bfloat16
    key = jax.random.key(0)

    def timeit(tag, fn, *arrs, iters=None):
        iters = iters or args.iters
        jfn = jax.jit(fn)
        t0 = time.time()
        np.asarray(jfn(*arrs))
        record(tag + "_compile_s", round(time.time() - t0, 1))
        t0 = time.perf_counter()
        outs = []
        for _ in range(iters):
            outs.append(jfn(*arrs))
        np.asarray(outs[-1])
        record(tag + "_ms", round((time.perf_counter() - t0) / iters * 1e3,
                                  3))

    # ---- up1 variants: (B, 24, 24, 1024) -> (B, 48, 48, 256) ----
    x1 = jax.random.normal(key, (b, 24, 24, 1024), bf)
    k1 = jax.random.normal(key, (3, 3, 1024, 256), bf) * 0.02
    b1 = jnp.zeros((256,), bf)

    def up1_resize_conv(x, k, bb):
        h, w = x.shape[-3], x.shape[-2]
        y = resize_bilinear(x, (2 * h, 2 * w))
        y = jnp.pad(y, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
        y = jax.lax.conv_general_dilated(
            y, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bb
        return y.astype(jnp.float32).mean()

    def up1_phase(x, k, bb):
        y = phase_upsample_conv3x3(x, k, bb, border="replicate")
        return y.astype(jnp.float32).mean()

    def up1_phase_nods(x, k, bb):
        # phase conv WITHOUT depth-to-space (consumers could read
        # phase-major if the next stage re-derives layout)
        y = phase_conv_phases(x, k, bb)
        return y.astype(jnp.float32).mean()

    timeit("up1_resize_conv", up1_resize_conv, x1, k1, b1)
    timeit("up1_phase", up1_phase, x1, k1, b1)
    timeit("up1_phase_nods", up1_phase_nods, x1, k1, b1)

    # ---- up2 variants: (B, 48, 48, 256) -> (B, 96, 96, 64) ----
    x2 = jax.random.normal(key, (b, 48, 48, 256), bf)
    k2 = jax.random.normal(key, (3, 3, 256, 64), bf) * 0.02
    b2 = jnp.zeros((64,), bf)
    timeit("up2_resize_conv", up1_resize_conv, x2, k2, b2)
    timeit("up2_phase", up1_phase, x2, k2, b2)

    # ---- dilated conv vs shift-matmul: (B, 24, 24, 512), d=4 ----
    xd = jax.random.normal(key, (b, 24, 24, 512), bf)
    kd = jax.random.normal(key, (3, 3, 512, 512), bf) * 0.02

    def dilated_conv(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(4, 4), (4, 4)], rhs_dilation=(4, 4),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.astype(jnp.float32).mean()

    def shift_matmul(x, k):
        bb_, h, w, c = x.shape
        xp = jnp.pad(x, [(0, 0), (4, 4), (4, 4), (0, 0)])
        y = 0.0
        for i in range(3):
            for j in range(3):
                sl = xp[:, i * 4:i * 4 + h, j * 4:j * 4 + w, :]
                y = y + sl @ k[i, j]
        return y.astype(jnp.float32).mean()

    timeit("dilated4_conv", dilated_conv, xd, kd)
    timeit("dilated4_shiftmm", shift_matmul, xd, kd)

    # dilation-2 (stage 3): (B, 24, 24, 256)
    xd2 = jax.random.normal(key, (b, 24, 24, 256), bf)
    kd2 = jax.random.normal(key, (3, 3, 256, 256), bf) * 0.02

    def dilated2_conv(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.astype(jnp.float32).mean()

    def shift2_matmul(x, k):
        bb_, h, w, c = x.shape
        xp = jnp.pad(x, [(0, 0), (2, 2), (2, 2), (0, 0)])
        y = 0.0
        for i in range(3):
            for j in range(3):
                sl = xp[:, i * 2:i * 2 + h, j * 2:j * 2 + w, :]
                y = y + sl @ k[i, j]
        return y.astype(jnp.float32).mean()

    timeit("dilated2_conv", dilated2_conv, xd2, kd2)
    timeit("dilated2_shiftmm", shift2_matmul, xd2, kd2)

    # plain 3x3 conv same shape for reference
    def plain_conv(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.astype(jnp.float32).mean()

    timeit("plain3x3_512", plain_conv, xd, kd)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
