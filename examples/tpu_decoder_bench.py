"""Decoder-optimization benchmark: dense (resize+conv) vs fused (phase-conv)
PSPNet on the real chip. One long-lived process; syncs scalars only."""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/decoder_bench.json")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--crop", type=int, default=192)
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
    record("session_setup_s", time.time() - t0)

    b, crop = args.batch, args.crop
    key = jax.random.key(0)
    img = jax.random.normal(key, (b, crop, crop, 3), jnp.float32)

    def bench(tag, model, *inputs, iters=20):
        fn = jax.jit(lambda p, *a: model.apply(p, *a).mean())  # scalar sync
        p = jax.jit(model.init)(key, *inputs)
        t0 = time.time()
        np.asarray(fn(p, *inputs))
        record(tag + "_compile_s", time.time() - t0)
        t0 = time.perf_counter()
        outs = []
        for _ in range(iters):
            outs.append(fn(p, *inputs))
        np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / iters * 1e3
        record(tag + "_ms", dt)
        return dt

    for fused in (False, True):
        tag = "fused" if fused else "dense"
        m = PSPNet(dtype=jnp.bfloat16, fused_decoder=fused)
        bench(f"pspnet_{tag}_b{b}", m, img)

    # end-to-end inference both ways
    n_pts, num_obj = 1000, 21
    pts = jax.random.normal(key, (b, n_pts, 3), jnp.float32) * 0.05
    choose = jax.random.randint(key, (b, n_pts), 0, crop * crop,
                                dtype=jnp.int32)
    obj = jax.random.randint(key, (b,), 0, num_obj, dtype=jnp.int32)
    for sparse in (True, False):
        for fused in (True, False):
            posenet = PoseNet(num_obj=num_obj, dtype=jnp.bfloat16,
                              sparse_emb=sparse, fused_decoder=fused)
            refiner = PoseRefineNet(num_obj=num_obj, dtype=jnp.bfloat16)
            tag = f"e2e_sparse{int(sparse)}_fused{int(fused)}"
            pp = jax.jit(posenet.init)(key, img, pts, choose, obj)
            out = jax.jit(posenet.apply)(pp, img, pts, choose, obj)
            rp = jax.jit(refiner.init)(key, pts, out["emb"], obj)
            pipe = InferencePipeline(posenet, refiner, refine_iters=2)
            t0 = time.time()
            q, t, c = pipe(pp, rp, img, pts, choose, obj)
            np.asarray(q[0, 0])
            record(tag + "_compile_s", time.time() - t0)
            iters = 30
            t0 = time.perf_counter()
            outs = []
            for _ in range(iters):
                q, t, c = pipe(pp, rp, img, pts, choose, obj)
                outs.append(q)
            np.asarray(outs[-1][0, 0])
            dt = time.perf_counter() - t0
            record(tag + "_fps", b * iters / dt)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
