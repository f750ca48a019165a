"""KNN kernel formulation bench on the real chip.

Compares the Pallas 1-NN reduction variants (variadic argmin vs two-pass
masked-iota min) across tile sizes and against the pure-XLA path, on the
training ADD-S shape (Q = B·N·M hypothesis points vs R mesh points) and the
eval shape. Exactness is asserted on-device against the XLA path before
timing. Run standalone under nohup on the TPU host:

    nohup python examples/tpu_knn_bench.py > /tmp/knn_bench.log 2>&1 &
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from densefusion_tpu.ops.knn import (
    nearest_neighbor_pallas, nearest_neighbor_xla,
)


def sync(x):
    return np.asarray(x)


def bench(fn, *args, repeats=30, **kw):
    out = fn(*args, **kw)
    sync(out[0][:1])
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args, **kw)
    sync(out[0][:1])
    return (time.perf_counter() - t0) / repeats


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    shapes = [
        ("train ADD-S (8x500 hyp x 500 mesh)", 250_000, 500),
        ("refine tail (1000 x 2600)", 1_000_000, 2600),
        ("eval remap (1000 x 500)", 1_000, 500),
    ]
    for name, nq, nr in shapes:
        q = jnp.asarray(rng.standard_normal((nq, 3)), jnp.float32)
        r = jnp.asarray(rng.standard_normal((nr, 3)), jnp.float32)

        d_ref, i_ref = nearest_neighbor_xla(q, r)
        d_ref, i_ref = sync(d_ref), sync(i_ref)

        t_xla = bench(nearest_neighbor_xla, q, r)
        print(f"\n{name}: XLA {t_xla*1e6:8.1f} us", flush=True)

        for reduction in ("argmin", "iota"):
            for qt in (256, 512, 1024):
                for rt in (256, 512):
                    if rt > ((nr + 255) // 256) * 256:
                        continue
                    try:
                        d, i = nearest_neighbor_pallas(
                            q, r, query_tile=qt, ref_tile=rt,
                            reduction=reduction)
                        np.testing.assert_allclose(sync(d), d_ref, rtol=2e-4,
                                                   atol=1e-5)
                        mism = (sync(i) != i_ref).mean()
                        assert mism < 1e-3, f"index mismatch {mism}"
                        t = bench(nearest_neighbor_pallas, q, r,
                                  query_tile=qt, ref_tile=rt,
                                  reduction=reduction)
                        pairs = nq * nr / t / 1e9
                        print(f"  pallas {reduction:6s} qt={qt:5d} rt={rt:4d}"
                              f" {t*1e6:8.1f} us  {pairs:7.1f} Gpairs/s",
                              flush=True)
                    except Exception as e:
                        print(f"  pallas {reduction:6s} qt={qt:5d} rt={rt:4d}"
                              f" FAILED: {type(e).__name__}: {e}",
                              flush=True)


def main_batched():
    """Batched kernel on the training ADD-S shapes + the full train step."""
    from densefusion_tpu.ops.knn import nearest_neighbor_pallas_batched
    rng = np.random.default_rng(0)
    print("\n=== batched kernel (train ADD-S remap shapes) ===", flush=True)
    for bsz in (8, 16, 32):
        q = jnp.asarray(rng.standard_normal((bsz, 500_000, 3)), jnp.float32)
        r = jnp.asarray(rng.standard_normal((bsz, 500, 3)), jnp.float32)
        # spot-exactness on sample 0 (XLA per-sample)
        d, i = nearest_neighbor_pallas_batched(q, r)
        d_want, i_want = nearest_neighbor_xla(q[0], r[0])
        np.testing.assert_allclose(sync(d[0]), sync(d_want), rtol=2e-4,
                                   atol=1e-5)
        assert (sync(i[0]) != sync(i_want)).mean() < 1e-3
        t = bench(nearest_neighbor_pallas_batched, q, r, repeats=10)
        pairs = bsz * 500_000 * 512 / t / 1e9
        print(f"  B={bsz:3d} x 500k x 500: {t*1e3:8.2f} ms "
              f"{pairs:7.1f} Gpairs/s", flush=True)

    print("\n=== full pose train step (grad, adds) ===", flush=True)
    from densefusion_tpu.cli.benchmark import bench_train_step
    for bsz in (8, 16, 32):
        try:
            out = bench_train_step(batch=bsz, repeats=5)
            print(f"  batch {bsz:3d}: {out['train_ms_per_step']:8.2f} ms "
                  f"({out['train_frames_per_s']:7.1f} frames/s)", flush=True)
        except Exception as e:
            print(f"  batch {bsz:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    import sys
    if "--batched" in sys.argv:
        main_batched()
    else:
        main()
        main_batched()
