"""up1 phase-conv formulation variants: native conv vs 9-shift matmul vs
split-N convs. All compute conv3x3(edge_pad(x)) with the composed 4-phase
kernel at half-res: (B, 24, 24, 1024) -> (B, 24, 24, 4*256)."""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/up1_variants.json")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()
    results = {}

    import jax
    import jax.numpy as jnp

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
    x = jax.random.normal(key, (b, 24, 24, 1024), bf)
    pk = jax.random.normal(key, (3, 3, 1024, 1024), bf) * 0.02

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

    def conv_native(x, pk):
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
        y = jax.lax.conv_general_dilated(
            xp, pk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.astype(jnp.float32).mean()

    def shift_matmul(x, pk):
        bb, h, w, c = x.shape
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
        y = 0.0
        for i in range(3):
            for j in range(3):
                sl = xp[:, i:i + h, j:j + w, :]
                y = y + sl @ pk[i, j]
        return y.astype(jnp.float32).mean()

    def conv_split2(x, pk):
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
        y1 = jax.lax.conv_general_dilated(
            xp, pk[..., :512], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y2 = jax.lax.conv_general_dilated(
            xp, pk[..., 512:], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (y1.astype(jnp.float32).mean() +
                y2.astype(jnp.float32).mean())

    def im2col_matmul(x, pk):
        bb, h, w, c = x.shape
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
        cols = [xp[:, i:i + h, j:j + w, :] for i in range(3)
                for j in range(3)]
        patches = jnp.concatenate(cols, axis=-1)       # (B, h, w, 9c)
        y = patches @ pk.reshape(9 * c, -1)
        return y.astype(jnp.float32).mean()

    timeit("conv_native", conv_native, x, pk)
    timeit("shift_matmul", shift_matmul, x, pk)
    timeit("conv_split2", conv_split2, x, pk)
    timeit("im2col_matmul", im2col_matmul, x, pk)

    # batch-majority reshape: fold batch into spatial rows (M = 36864)
    def flat_shift_matmul(x, pk):
        bb, h, w, c = x.shape
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
        y = 0.0
        for i in range(3):
            for j in range(3):
                sl = xp[:, i:i + h, j:j + w, :].reshape(bb * h * w, c)
                y = y + sl @ pk[i, j]
        return y.astype(jnp.float32).mean()

    timeit("flat_shift_matmul", flat_shift_matmul, x, pk)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
