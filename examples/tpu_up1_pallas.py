"""Pallas up1 probe: the 24² x1024 -> 1024 (4-phase x256) conv as an
explicit 9-tap accumulating MXU matmul kernel.

Round-2b probed four XLA formulations of up1 (native conv / shift-matmul /
split-N / im2col) at a shared ~5 ms floor for batch 64 (docs/PERF.md); a
hand-scheduled Pallas kernel was never tried. Theoretical floor at the
shape (64·576 rows x K=1024 x N=1024, 9 taps) is ~3.5 ms on v5e.

Kernel: grid (col_halves, B). Each step loads one edge-padded image block
(1, 26, 26, 1024) bf16 and a (9, 1024, N_tile) weight block, accumulates
the nine shifted (576, 1024) @ (1024, N_tile) matmuls in f32, writes
(24, 24, N_tile) bf16. The weight block's index map depends only on the
outer grid dim, so it stays resident across the batch sweep.

Usage: python examples/tpu_up1_pallas.py [--iters 30]
"""

import argparse
import functools
import json
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
    from jax.experimental import pallas as pl

    results = {}

    def record(k, v):
        results[k] = v
        print(k, v, flush=True)

    B, H, W, CIN, COUT = args.batch, 24, 24, 1024, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, CIN)), jnp.bfloat16)
    pk = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)) * 0.02,
                     jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((COUT,)) * 0.1, jnp.bfloat16)

    # -- XLA reference: replicate-padded VALID conv (phase_conv_phases form)
    @jax.jit
    def conv_xla(x, pk, bias):
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
        y = jax.lax.conv_general_dilated(
            xp, pk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)

    # -- Pallas kernel -----------------------------------------------------
    def kernel(x_ref, w_ref, b_ref, o_ref, *, n_tile):
        acc = jnp.zeros((H * W, n_tile), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xs = x_ref[0, dy:dy + H, dx:dx + W, :].reshape(H * W, CIN)
                acc += jax.lax.dot_general(
                    xs, w_ref[3 * dy + dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc += b_ref[0].astype(jnp.float32)[None, :]
        o_ref[0] = acc.astype(o_ref.dtype).reshape(H, W, n_tile)

    def conv_pallas(x, pk, bias, n_tile):
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
        w = pk.reshape(9, CIN, COUT)
        bn = bias.reshape(COUT // n_tile, n_tile)
        grid = (COUT // n_tile, B)
        return pl.pallas_call(
            functools.partial(kernel, n_tile=n_tile),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, H + 2, W + 2, CIN), lambda h, b: (b, 0, 0, 0)),
                pl.BlockSpec((9, CIN, n_tile), lambda h, b: (0, 0, h)),
                pl.BlockSpec((1, n_tile), lambda h, b: (h, 0)),
            ],
            out_specs=pl.BlockSpec((1, H, W, n_tile),
                                   lambda h, b: (b, 0, 0, h)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, COUT), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * H * W * 9 * CIN * COUT,
                bytes_accessed=(COUT // n_tile) * B * (H + 2) * (W + 2)
                * CIN * 2 + B * H * W * COUT * 2 + 9 * CIN * COUT * 2,
                transcendentals=0,
            ),
        )(xp, w, bn)

    def timeit(tag, fn, *arrs, iters=None):
        iters = iters or args.iters
        t0 = time.perf_counter()
        r = fn(*arrs)
        _ = np.asarray(r[0, 0, 0, :1], np.float32)
        record(tag + "_compile_s", round(time.perf_counter() - t0, 1))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*arrs)
        _ = np.asarray(r[0, 0, 0, :1], np.float32)
        dt = (time.perf_counter() - t0) / iters * 1e3
        record(tag + "_ms", round(dt, 3))
        return r

    ref = timeit("xla", conv_xla, x, pk, bias)
    for n_tile in (512, 256):
        f = jax.jit(functools.partial(conv_pallas, n_tile=n_tile))
        try:
            got = timeit(f"pallas_n{n_tile}", f, x, pk, bias)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            record(f"pallas_n{n_tile}_maxerr", err)
            record(f"pallas_n{n_tile}_rel", rel)
        except Exception as e:  # noqa: BLE001
            record(f"pallas_n{n_tile}_error", repr(e)[:500])

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("DONE")


if __name__ == "__main__":
    main()
