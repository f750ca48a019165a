"""Post-one-hot-select measurement: posenet/pipeline after folding object
selection into fc4 and de-gathering the sparse tail, plus gather
micro-probes. Methodology per docs/PERF.md."""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/select_bench.json")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()
    results = {}

    import jax
    import jax.numpy as jnp
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.models.pspnet import PSPNet
    from densefusion_tpu.eval import InferencePipeline

    def record(k, v):
        results[k] = v
        print(k, v, flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    t0 = time.time()
    _ = np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    record("session_setup_s", round(time.time() - t0, 1))

    b, n_pts, num_obj, crop = args.batch, 1000, 21, 192
    bf = jnp.bfloat16
    key = jax.random.key(0)
    img = jax.random.normal(key, (b, crop, crop, 3), jnp.float32)
    pts = jax.random.normal(key, (b, n_pts, 3), jnp.float32) * 0.05
    choose = jax.random.randint(key, (b, n_pts), 0, crop * crop,
                                dtype=jnp.int32)
    obj = jax.random.randint(key, (b,), 0, num_obj, dtype=jnp.int32)

    posenet = PoseNet(num_obj=num_obj, dtype=bf)
    refiner = PoseRefineNet(num_obj=num_obj, dtype=bf)
    pp = jax.jit(posenet.init)(key, img, pts, choose, obj)
    out0 = jax.jit(posenet.apply)(pp, img, pts, choose, obj)
    rp = jax.jit(refiner.init)(key, pts, out0["emb"], obj)

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

    # gather micro-probes at the sparse-tail shape: (B, 9216, 64) rows
    src = jax.random.normal(key, (b, 9216, 64), bf)
    idx = jax.random.randint(key, (b, 9000), 0, 9216, jnp.int32)

    def row_gather(src, idx):
        out = jnp.take_along_axis(src, idx[..., None], axis=1)
        return out.astype(jnp.float32).mean()

    def onehot_gather(src, idx):
        # contraction alternative at this shape would be (9000, 9216) one-hot
        # matmul = 5.3 TFLOP/batch — not viable; probe the gather cost only
        return src.astype(jnp.float32).mean() + idx.sum().astype(jnp.float32)

    timeit("row_gather_9k_64", row_gather, src, idx)

    # emb-map row gather at dense-path shape: (B, 36864, 32)
    src2 = jax.random.normal(key, (b, crop * crop, 32), bf)
    idx2 = jax.random.randint(key, (b, n_pts), 0, crop * crop, jnp.int32)

    def row_gather2(src, idx):
        out = jnp.take_along_axis(src, idx[..., None], axis=1)
        return out.astype(jnp.float32).mean()

    timeit("row_gather_1k_32", row_gather2, src2, idx2)

    def cnn_sparse(cp, img, choose):
        m = PSPNet(dtype=bf)
        emb = m.apply({"params": cp}, img, sample_at=choose)
        return emb.mean()

    timeit("cnn_sparse", cnn_sparse, pp["params"]["cnn"], img, choose)

    def posenet_full(pp, img, pts, choose, obj):
        out = posenet.apply(pp, img, pts, choose, obj)
        return out["pred_r"].mean() + out["pred_t"].mean() + \
            out["pred_c"].mean()

    timeit("posenet_full", posenet_full, pp, img, pts, choose, obj)

    def refine_once(rp, pts, emb, obj):
        o = refiner.apply(rp, pts, emb, obj)
        return o["pred_r"].mean() + o["pred_t"].mean()

    timeit("refiner_once", refine_once, rp, pts, out0["emb"], obj)

    pipe = InferencePipeline(posenet, refiner, refine_iters=2)

    def run(pp, rp, i, p, c, o):
        q, t, _ = pipe._infer(pp, rp, i, p, c, o)
        return q.mean() + t.mean()

    timeit("pipeline_r2", run, pp, rp, img, pts, choose, obj)
    record("pipeline_r2_fps", round(b / results["pipeline_r2_ms"] * 1e3, 1))

    # dense-emb posenet for comparison (sparse_emb=False)
    posenet_d = PoseNet(num_obj=num_obj, dtype=bf, sparse_emb=False)
    pipe_d = InferencePipeline(posenet_d, refiner, refine_iters=2)

    def run_d(pp, rp, i, p, c, o):
        q, t, _ = pipe_d._infer(pp, rp, i, p, c, o)
        return q.mean() + t.mean()

    timeit("pipeline_r2_dense", run_d, pp, rp, img, pts, choose, obj)
    record("pipeline_r2_dense_fps",
           round(b / results["pipeline_r2_dense_ms"] * 1e3, 1))

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
