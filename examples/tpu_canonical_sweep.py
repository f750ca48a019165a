"""Canonical quiet-window performance sweep (VERDICT r2 item 6).

One session, one table: every headline number re-taken together so PERF.md
can carry a single authoritative set instead of cross-session comparisons
on a 20x-variance tunnel. Covers:

  * inference throughput (batch 64, bf16, pipelined) + batch-1 latency
  * device-side model+loss grad at batch 32 (f32 and bf16; sym = 0/8/32)
  * refine-phase loss grad (N=1, M=2600)
  * 1-NN kernel Gpairs/s at the three canonical shapes
  * host loader samples/s (4 fork workers, shm ring, synthetic YCB)

    nohup python examples/tpu_canonical_sweep.py > /tmp/canon.log 2>&1 &

Writes JSON to --out (default /tmp/canonical_sweep.json).
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/canonical_sweep.json")
    ap.add_argument("--repeats", type=int, default=20)
    ap.add_argument("--loader_root", default="/tmp/canon_ycb")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    res = {}

    def rec(k, v):
        res[k] = v
        print(f"{k}: {v}", flush=True)

    def sync(x):
        return np.asarray(x)

    def bench_ms(fn, *a, repeats=None):
        reps = repeats or args.repeats
        out = fn(*a)
        sync(jax.tree.leaves(out)[0].reshape(-1)[:1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        sync(jax.tree.leaves(out)[0].reshape(-1)[:1])
        return (time.perf_counter() - t0) / reps * 1e3

    rec("devices", str(jax.devices()))
    rng = np.random.default_rng(0)

    # ---- inference throughput + latency -----------------------------------
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.eval import InferencePipeline

    num_obj, n, m, crop = 21, 1000, 500, 192
    b = 64
    img = jnp.asarray(rng.standard_normal((b, crop, crop, 3)), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((b, n, 3)) * 0.05, jnp.float32)
    choose = jnp.asarray(rng.integers(0, crop * crop, (b, n)), jnp.int32)
    obj = jnp.asarray(rng.integers(0, num_obj, (b,)), jnp.int32)

    posenet_bf = PoseNet(num_obj=num_obj, dtype=jnp.bfloat16)
    refiner_bf = PoseRefineNet(num_obj=num_obj, dtype=jnp.bfloat16)
    pparams = jax.jit(posenet_bf.init)(jax.random.key(0), img, pts, choose,
                                       obj)
    emb = jax.jit(posenet_bf.apply)(pparams, img, pts, choose, obj)["emb"]
    rparams = jax.jit(refiner_bf.init)(jax.random.key(0), pts, emb, obj)
    pipe = InferencePipeline(posenet_bf, refiner_bf, refine_iters=2)

    outs = pipe(pparams, rparams, img, pts, choose, obj)
    sync(outs[0])
    t0 = time.perf_counter()
    iters = 30
    for _ in range(iters):
        outs = pipe(pparams, rparams, img, pts, choose, obj)
    sync(outs[0])
    dt = time.perf_counter() - t0
    rec("inference_fps_b64_bf16", round(b * iters / dt, 1))

    lat = []
    img1, pts1 = img[:1], pts[:1]
    ch1, ob1 = choose[:1], obj[:1]
    pipe(pparams, rparams, img1, pts1, ch1, ob1)  # compile
    for _ in range(30):
        t0 = time.perf_counter()
        sync(pipe(pparams, rparams, img1, pts1, ch1, ob1)[0])
        lat.append(time.perf_counter() - t0)
    rec("latency_b1_ms_median", round(float(np.median(lat)) * 1e3, 1))
    rec("latency_b1_ms_p90", round(float(np.percentile(lat, 90)) * 1e3, 1))

    # ---- train grad: b32, f32 + bf16, sym 0/8/32 ---------------------------
    from densefusion_tpu.losses.pose_loss import pose_loss

    b = 32
    img = img[:b]
    pts, choose, obj = pts[:b], choose[:b], obj[:b]
    target = jnp.asarray(rng.standard_normal((b, m, 3)) * 0.05, jnp.float32)
    model = jnp.asarray(rng.standard_normal((b, m, 3)) * 0.05, jnp.float32)
    w = jnp.float32(0.015)

    for dt_name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        posenet = PoseNet(num_obj=num_obj, dtype=dt)
        params = jax.jit(posenet.init)(jax.random.key(0), img, pts, choose,
                                       obj)
        for ns in (0, 8, 32):
            sym = jnp.arange(b) < ns

            def f(p, sym=sym, posenet=posenet):
                out = posenet.apply(p, img, pts, choose, obj, train=True,
                                    rngs={"dropout": jax.random.key(1)})
                return pose_loss(out["pred_r"], out["pred_t"], out["pred_c"],
                                 target, model, pts, sym, w,
                                 use_adds=True).loss
            ms = bench_ms(jax.jit(jax.grad(f)), params, repeats=10)
            rec(f"train_grad_b32_{dt_name}_sym{ns}_ms", round(ms, 2))

    # ---- refine-phase loss grad (N=1, M=2600) ------------------------------
    from densefusion_tpu.losses.pose_loss import refiner_loss

    m2 = 2600
    tgt2 = jnp.asarray(rng.standard_normal((b, m2, 3)) * 0.05, jnp.float32)
    mdl2 = jnp.asarray(rng.standard_normal((b, m2, 3)) * 0.05, jnp.float32)
    pr = jnp.asarray(rng.standard_normal((b, 4)), jnp.float32)
    pt_ = jnp.asarray(rng.standard_normal((b, 3)) * 0.05, jnp.float32)
    sym8 = jnp.arange(b) < 8

    def rf(r, t):
        return refiner_loss(r, t, tgt2, mdl2, pts, sym8).loss
    ms = bench_ms(jax.jit(jax.grad(rf, argnums=(0, 1))), pr, pt_, repeats=10)
    rec("refine_loss_grad_b32_M2600_ms", round(ms, 2))

    # ---- 1-NN kernel Gpairs/s ----------------------------------------------
    from densefusion_tpu.ops.knn import nearest_neighbor

    for name, (q_n, r_n) in (("train_adds_250k_x_500", (250_000, 500)),
                             ("refine_tail_1m_x_2600", (1_000_000, 2600)),
                             ("eval_remap_1k_x_500", (1000, 500))):
        q = jnp.asarray(rng.standard_normal((q_n, 3)), jnp.float32)
        r = jnp.asarray(rng.standard_normal((r_n, 3)), jnp.float32)
        fn = jax.jit(lambda q, r: nearest_neighbor(q, r, backend="pallas"))
        ms = bench_ms(fn, q, r, repeats=10)
        rec(f"nn_{name}_ms", round(ms, 3))
        rec(f"nn_{name}_gpairs_s", round(q_n * r_n / ms / 1e6, 1))

    # ---- host loader -------------------------------------------------------
    import os
    from densefusion_tpu.data.synthetic import generate_ycb_style_dataset
    from densefusion_tpu.data.ycb import YCBDataset
    from densefusion_tpu.data.loader import BatchLoader

    if not os.path.isdir(os.path.join(args.loader_root, "dataset_config")):
        generate_ycb_style_dataset(args.loader_root, n_classes=5, n_real=64,
                                   n_syn=16, n_test=8, seed=3)
    ds = YCBDataset(args.loader_root, mode="train", num_points=1000,
                    crop_size=192, add_noise=True)
    loader = BatchLoader(ds, batch_size=16, shuffle=True, num_workers=4,
                         worker_mode="process")
    t0 = time.perf_counter()
    count = 0
    for bt in loader.epoch(0):
        count += int(bt.obj_idx.shape[0])
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    count = 0
    for bt in loader.epoch(1):
        count += int(bt.obj_idx.shape[0])
    rec("loader_samples_s_4workers", round(count /
                                           (time.perf_counter() - t0), 1))
    loader.close()

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print("DONE")


if __name__ == "__main__":
    main()
