"""One-session TPU benchmark sweep (inference / train step / Pallas KNN).
Writes JSON results to --out. Designed to run as a single long-lived process
so remote-TPU session setup and compiles are paid once."""

import argparse
import json
import time

import numpy as np


def sync(x):
    return np.asarray(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tpu_bench.json")
    args = ap.parse_args()
    results = {}

    import jax
    import jax.numpy as jnp
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.eval import InferencePipeline
    from densefusion_tpu.data import PoseSample
    from densefusion_tpu.train import create_train_state, make_pose_train_step
    from densefusion_tpu.train.state import make_optimizer
    from densefusion_tpu.utils.config import RunConfig
    from densefusion_tpu.ops.knn import nearest_neighbor_pallas

    def record(k, v):
        results[k] = v
        print(k, v, flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    t_session = time.time()
    _ = np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    record("session_setup_s", time.time() - t_session)

    num_obj, crop, n_pts = 21, 192, 1000
    key = jax.random.key(0)

    # --- Pallas KNN at the training ADD-S shape -------------------------
    rng = np.random.default_rng(0)
    q_ = jnp.asarray(rng.standard_normal((250_000, 3)), jnp.float32)
    r_ = jnp.asarray(rng.standard_normal((500, 3)), jnp.float32)
    t0 = time.time()
    d, i = nearest_neighbor_pallas(q_, r_)
    sync(i[:1])
    record("knn_compile_s", time.time() - t0)
    t0 = time.perf_counter()
    outs = []
    for _ in range(20):
        d, i = nearest_neighbor_pallas(q_, r_)
        outs.append(i)
    sync(outs[-1][:1])
    dt = (time.perf_counter() - t0) / 20
    record("knn_us", dt * 1e6)
    record("knn_tpairs_per_s", 250_000 * 512 / dt / 1e12)

    # --- inference (bf16, batch 64, pipelined) --------------------------
    for batch in (16, 64):
        imgs = [jax.random.normal(jax.random.key(i),
                                  (batch, crop, crop, 3), jnp.float32)
                for i in range(4)]
        pts = jax.random.normal(key, (batch, n_pts, 3), jnp.float32) * 0.05
        choose = jax.random.randint(key, (batch, n_pts), 0, crop * crop,
                                    dtype=jnp.int32)
        obj = jax.random.randint(key, (batch,), 0, num_obj, dtype=jnp.int32)
        posenet = PoseNet(num_obj=num_obj, dtype=jnp.bfloat16)
        refiner = PoseRefineNet(num_obj=num_obj, dtype=jnp.bfloat16)
        pp = jax.jit(posenet.init)(key, imgs[0], pts, choose, obj)
        out = jax.jit(posenet.apply)(pp, imgs[0], pts, choose, obj)
        rp = jax.jit(refiner.init)(key, pts, out["emb"], obj)
        pipe = InferencePipeline(posenet, refiner, refine_iters=2)
        t0 = time.time()
        q, t, c = pipe(pp, rp, imgs[0], pts, choose, obj)
        sync(q)
        record(f"inference_b{batch}_compile_s", time.time() - t0)
        iters = 20
        t0 = time.perf_counter()
        outs = []
        for i in range(iters):
            q, t, c = pipe(pp, rp, imgs[i % 4], pts, choose, obj)
            outs.append(q)
        sync(outs[-1])
        dt = time.perf_counter() - t0
        record(f"inference_b{batch}_fps", batch * iters / dt)

    # --- train step (bf16, batch 32, ADD-S active) ----------------------
    b, m = 32, 500
    tb = PoseSample(
        points=rng.standard_normal((b, 500, 3)).astype(np.float32) * 0.05,
        choose=rng.integers(0, crop * crop, (b, 500)).astype(np.int32),
        img=rng.standard_normal((b, crop, crop, 3)).astype(np.float32),
        target=rng.standard_normal((b, m, 3)).astype(np.float32) * 0.05,
        model_points=rng.standard_normal((b, m, 3)).astype(np.float32) * 0.05,
        obj_idx=rng.integers(0, num_obj, (b,)).astype(np.int32),
        sym=np.zeros((b,), bool), valid=np.ones((b,), bool))
    cfg = RunConfig.preset("ycb")
    pn = PoseNet(num_obj=num_obj, dtype=jnp.bfloat16)
    rf = PoseRefineNet(num_obj=num_obj, dtype=jnp.bfloat16)
    state = create_train_state(pn, rf, cfg, jax.random.key(0), tb)
    tx = make_optimizer(cfg.lr)
    step = make_pose_train_step(pn, tx, use_adds=True)
    w = np.float32(0.015)
    t0 = time.time()
    state, mt = step(state, tb, w)
    sync(mt["loss"])
    record("train_compile_s", time.time() - t0)
    K = 10
    t0 = time.perf_counter()
    last = None
    for _ in range(K):
        state, mt = step(state, tb, w)
        last = mt["loss"]
    sync(last)
    dt = (time.perf_counter() - t0) / K
    record("train_ms_per_step", dt * 1e3)
    record("train_frames_per_s", b / dt)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
