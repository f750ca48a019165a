"""PoseNet non-CNN decomposition bench: where do fusion/heads/refiner go?
Cumulative timings at the flagship config (b64, N=1000, 21 obj, bf16).
Long-lived process; scalar syncs only."""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/posenet_bench.json")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    results = {}

    import jax
    import jax.numpy as jnp
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.models.posenet import (
        DenseFusionFeat, select_object,
    )
    from densefusion_tpu.eval import InferencePipeline

    def record(k, v):
        results[k] = v
        print(k, v, flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    t0 = time.time()
    _ = np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    record("session_setup_s", time.time() - t0)

    b, n_pts, num_obj, crop = args.batch, 1000, 21, 192
    key = jax.random.key(0)
    img = jax.random.normal(key, (b, crop, crop, 3), jnp.float32)
    pts = jax.random.normal(key, (b, n_pts, 3), jnp.float32) * 0.05
    choose = jax.random.randint(key, (b, n_pts), 0, crop * crop,
                                dtype=jnp.int32)
    obj = jax.random.randint(key, (b,), 0, num_obj, dtype=jnp.int32)

    posenet = PoseNet(num_obj=num_obj, dtype=jnp.bfloat16)
    refiner = PoseRefineNet(num_obj=num_obj, dtype=jnp.bfloat16)
    pp = jax.jit(posenet.init)(key, img, pts, choose, obj)
    out0 = jax.jit(posenet.apply)(pp, img, pts, choose, obj)
    rp = jax.jit(refiner.init)(key, pts, out0["emb"], obj)

    def timeit(tag, fn, *arrs, iters=30):
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

    # CNN (sparse) only — emb at choose pixels
    def cnn_only(pp, img, choose):
        from densefusion_tpu.models.pspnet import PSPNet
        m = PSPNet(dtype=jnp.bfloat16)
        emb = m.apply({"params": pp["params"]["cnn"]}, img,
                      sample_at=choose)
        return emb.mean()

    timeit("cnn_sparse_only", cnn_only, pp, img, choose)

    def cnn_fusion(pp, img, pts, choose):
        from densefusion_tpu.models.pspnet import PSPNet
        m = PSPNet(dtype=jnp.bfloat16)
        emb = m.apply({"params": pp["params"]["cnn"]}, img, sample_at=choose)
        feat = DenseFusionFeat(dtype=jnp.bfloat16).apply(
            {"params": pp["params"]["fusion"]}, pts, emb)
        return feat.astype(jnp.float32).mean()

    timeit("cnn_fusion", cnn_fusion, pp, img, pts, choose)

    def full_posenet(pp, img, pts, choose, obj):
        out = posenet.apply(pp, img, pts, choose, obj)
        return out["pred_r"].mean() + out["pred_t"].mean() + \
            out["pred_c"].mean()

    timeit("posenet_full", full_posenet, pp, img, pts, choose, obj)

    # refiner alone (1 application)
    emb = out0["emb"]

    def refine_once(rp, pts, emb, obj):
        o = refiner.apply(rp, pts, emb, obj)
        return o["pred_r"].mean() + o["pred_t"].mean()

    timeit("refiner_once", refine_once, rp, pts, emb, obj)

    # full pipelines at 0/1/2/4 iterations
    for iters_r in (0, 1, 2, 4):
        pipe = InferencePipeline(posenet, refiner, refine_iters=iters_r)

        def run(pp, rp, img, pts, choose, obj, pipe=pipe):
            q, t, c = pipe._infer(pp, rp, img, pts, choose, obj)
            return q.mean() + t.mean()

        timeit(f"pipeline_r{iters_r}", run, pp, rp, img, pts, choose, obj)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
