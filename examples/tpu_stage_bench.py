"""Fine-grained stage decomposition of the flagship inference graph.

Times cumulative prefixes of the PoseNet+refine pipeline (trunk stem,
trunk, PSP, up1, up2, sparse tail, fusion, heads, select, refine x2) so
successive differences give per-stage cost, plus batch-scaling (64/128/256)
and a space-to-depth stem micro-experiment.

Methodology per docs/PERF.md: long-lived process, pipelined submission
(iters in flight, one scalar np.asarray sync), bf16 compute.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/stage_bench.json")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    results = {}

    import jax
    import jax.numpy as jnp
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.models.posenet import DenseFusionFeat, select_object
    from densefusion_tpu.models.pspnet import (
        PSPNet, PSPModule, PSPUpsample, sparse_upsample_taps, _Conv3x3Params,
    )
    from densefusion_tpu.models.resnet import DilatedResNet
    from densefusion_tpu.models.layers import PReLU
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
    cnn_params = pp["params"]["cnn"]

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

    # ---- cumulative CNN prefixes (each runs from the image) ----
    trunk = DilatedResNet(variant="resnet18", dtype=bf)
    psp = PSPModule(out_features=1024, dtype=bf)
    up1 = PSPUpsample(256, dtype=bf, fused=False, border="replicate")
    up2 = PSPUpsample(64, dtype=bf, fused=True, border="replicate")

    def prefix_trunk(cp, img):
        f, _ = trunk.apply({"params": cp["trunk"]}, img)
        return f.astype(jnp.float32).mean()

    def prefix_psp(cp, img):
        f, _ = trunk.apply({"params": cp["trunk"]}, img)
        p = psp.apply({"params": cp["psp"]}, f)
        return p.astype(jnp.float32).mean()

    def prefix_up1(cp, img):
        f, _ = trunk.apply({"params": cp["trunk"]}, img)
        p = psp.apply({"params": cp["psp"]}, f)
        p = up1.apply({"params": cp["up1"]}, p)
        return p.astype(jnp.float32).mean()

    def prefix_up2(cp, img):
        f, _ = trunk.apply({"params": cp["trunk"]}, img)
        p = psp.apply({"params": cp["psp"]}, f)
        p = up1.apply({"params": cp["up1"]}, p)
        p = up2.apply({"params": cp["up2"]}, p)
        return p.astype(jnp.float32).mean()

    def cnn_sparse(cp, img, choose):
        m = PSPNet(dtype=bf)
        emb = m.apply({"params": cp}, img, sample_at=choose)
        return emb.mean()

    def cnn_dense(cp, img):
        m = PSPNet(dtype=bf)
        emb = m.apply({"params": cp}, img)
        return emb.mean()

    def cnn_fusion(pp, img, pts, choose):
        m = PSPNet(dtype=bf)
        emb = m.apply({"params": pp["params"]["cnn"]}, img, sample_at=choose)
        feat = DenseFusionFeat(dtype=bf).apply(
            {"params": pp["params"]["fusion"]}, pts, emb)
        return feat.astype(jnp.float32).mean()

    def posenet_full(pp, img, pts, choose, obj):
        out = posenet.apply(pp, img, pts, choose, obj)
        return out["pred_r"].mean() + out["pred_t"].mean() + \
            out["pred_c"].mean()

    timeit("trunk", prefix_trunk, cnn_params, img)
    timeit("trunk_psp", prefix_psp, cnn_params, img)
    timeit("trunk_psp_up1", prefix_up1, cnn_params, img)
    timeit("trunk_psp_up1_up2", prefix_up2, cnn_params, img)
    timeit("cnn_sparse", cnn_sparse, cnn_params, img, choose)
    timeit("cnn_dense", cnn_dense, cnn_params, img)
    timeit("cnn_fusion", cnn_fusion, pp, img, pts, choose)
    timeit("posenet_full", posenet_full, pp, img, pts, choose, obj)

    # ---- refiner alone ----
    emb0 = out0["emb"]

    def refine_once(rp, pts, emb, obj):
        o = refiner.apply(rp, pts, emb, obj)
        return o["pred_r"].mean() + o["pred_t"].mean()

    timeit("refiner_once", refine_once, rp, pts, emb0, obj)

    # ---- e2e pipeline at several batch sizes ----
    for bb in (64, 128, 256):
        imgb = jax.random.normal(key, (bb, crop, crop, 3), jnp.float32)
        ptsb = jax.random.normal(key, (bb, n_pts, 3), jnp.float32) * 0.05
        chb = jax.random.randint(key, (bb, n_pts), 0, crop * crop,
                                 dtype=jnp.int32)
        objb = jax.random.randint(key, (bb,), 0, num_obj, dtype=jnp.int32)
        pipe = InferencePipeline(posenet, refiner, refine_iters=2)

        def run(pp, rp, i, p, c, o, pipe=pipe):
            q, t, _ = pipe._infer(pp, rp, i, p, c, o)
            return q.mean() + t.mean()

        it = max(8, args.iters * 64 // bb)
        timeit(f"pipeline_r2_b{bb}", run, pp, rp, imgb, ptsb, chb, objb,
               iters=it)
        results[f"pipeline_r2_b{bb}_fps"] = round(
            bb / results[f"pipeline_r2_b{bb}_ms"] * 1e3, 1)
        record(f"pipeline_r2_b{bb}_fps", results[f"pipeline_r2_b{bb}_fps"])

    # ---- stem micro-experiment: conv7x7/s2 vs space-to-depth conv4x4 ----
    k7 = jax.random.normal(key, (7, 7, 3, 64), bf) * 0.05

    def stem_conv7(img, k7):
        x = img.astype(bf)
        y = jax.lax.conv_general_dilated(
            x, k7, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.astype(jnp.float32).mean()

    # exact same map as conv7x7/s2(pad 3): block the input 2x2 into 12
    # channels, conv 4x4 stride 1 with the phase-decomposed kernel
    def make_k4(k7):
        k8 = jnp.pad(k7, [(1, 0), (1, 0), (0, 0), (0, 0)])  # u-3=2m+p, m:-2..1
        # index u = 2m + p + 3 -> padded u' = u + 1 = 2(m+2) + p
        k4 = k8.reshape(4, 2, 4, 2, 3, 64)                  # (m, p, n, q, c, o)
        return k4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, 64)

    def stem_s2d(img, k7):
        x = img.astype(bf)
        bb, h, w, c = x.shape
        xb = x.reshape(bb, h // 2, 2, w // 2, 2, c)
        xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(bb, h // 2, w // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            xb, make_k4(k7), window_strides=(1, 1), padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.astype(jnp.float32).mean()

    # exactness check first (f32 on small input)
    xi = jax.random.normal(key, (2, 16, 16, 3), jnp.float32)
    k7f = jax.random.normal(key, (7, 7, 3, 64), jnp.float32)
    a = jax.lax.conv_general_dilated(
        xi, k7f, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xb = xi.reshape(2, 8, 2, 8, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(2, 8, 8, 12)
    k8 = jnp.pad(k7f, [(1, 0), (1, 0), (0, 0), (0, 0)])
    k4 = k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
    k4 = k4.reshape(4, 4, 12, 64)
    bsd = jax.lax.conv_general_dilated(
        xb, k4, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    record("s2d_max_err", float(jnp.abs(a - bsd).max()))

    timeit("stem_conv7", stem_conv7, img, k7, iters=60)
    timeit("stem_s2d", stem_s2d, img, k7, iters=60)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
