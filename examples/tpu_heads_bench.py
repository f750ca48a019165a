"""Head-stack decomposition: where do the pose/conf heads' 9.6 ms go?

Times cumulative prefixes of apply_head_stacks on a random (B, N, 1408)
fused feature at the flagship config, a block-stacked einsum variant, and
the new sparse_phase_decode tail. Long-lived process, pipelined scalar-sync
timing (docs/PERF.md methodology).
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/heads_bench.json")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()
    results = {}

    import jax
    import jax.numpy as jnp
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.models.posenet import select_object
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
    feat = jax.random.normal(key, (b, n_pts, 1408), bf)
    obj = jax.random.randint(key, (b,), 0, num_obj, dtype=jnp.int32)

    # random head weights shaped like the real ones
    def mk(shape, i):
        return jax.random.normal(jax.random.key(i), shape, bf) * 0.02

    widths = (640, 256, 128)
    heads = []
    out_dims = (4, 3, 1)
    i = 0
    for od in out_dims:
        layers = []
        d = 1408
        for wdt in widths:
            layers.append((mk((d, wdt), i), mk((wdt,), i + 1)))
            d = wdt
            i += 2
        layers.append((mk((d, num_obj * od), i), mk((num_obj * od,), i + 1)))
        i += 2
        heads.append(layers)

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

    import flax.linen as nn
    k1 = jnp.concatenate([h[0][0] for h in heads], axis=1)
    b1 = jnp.concatenate([h[0][1] for h in heads])

    def l1_only(feat, k1, b1):
        y = nn.relu(feat @ k1 + b1)
        return y.astype(jnp.float32).mean()

    def l12(feat, k1, b1, heads):
        y = nn.relu(feat @ k1 + b1)
        s = 0.0
        for idx, head in enumerate(heads):
            x = y[..., idx * 640:(idx + 1) * 640]
            k, bb = head[1]
            x = nn.relu(x @ k + bb)
            s = s + x.astype(jnp.float32).mean()
        return s

    def l123(feat, k1, b1, heads):
        y = nn.relu(feat @ k1 + b1)
        s = 0.0
        for idx, head in enumerate(heads):
            x = y[..., idx * 640:(idx + 1) * 640]
            for k, bb in head[1:3]:
                x = nn.relu(x @ k + bb)
            s = s + x.astype(jnp.float32).mean()
        return s

    def full(feat, k1, b1, heads):
        s = 0.0
        y = nn.relu(feat @ k1 + b1)
        for idx, (head, od) in enumerate(zip(heads, out_dims)):
            x = y[..., idx * 640:(idx + 1) * 640]
            for k, bb in head[1:-1]:
                x = nn.relu(x @ k + bb)
            k, bb = head[-1]
            x = x @ k + bb
            s = s + x.astype(jnp.float32).mean()
        return s

    def full_select(feat, k1, b1, heads, obj):
        s = 0.0
        y = nn.relu(feat @ k1 + b1)
        for idx, (head, od) in enumerate(zip(heads, out_dims)):
            x = y[..., idx * 640:(idx + 1) * 640]
            for k, bb in head[1:-1]:
                x = nn.relu(x @ k + bb)
            k, bb = head[-1]
            x = x @ k + bb
            x = x.reshape(x.shape[:-1] + (num_obj, od))
            s = s + select_object(x, obj).astype(jnp.float32).mean()
        return s

    timeit("l1_only", l1_only, feat, k1, b1)
    timeit("l12", l12, feat, k1, b1, heads)
    timeit("l123", l123, feat, k1, b1, heads)
    timeit("heads_full", full, feat, k1, b1, heads)
    timeit("heads_full_select", full_select, feat, k1, b1, heads, obj)

    # stacked variant: L2/L3 as one 3-head einsum, L4 padded-stacked
    k2s = jnp.stack([h[1][0] for h in heads])           # (3, 640, 256)
    b2s = jnp.stack([h[1][1] for h in heads])           # (3, 256)
    k3s = jnp.stack([h[2][0] for h in heads])           # (3, 256, 128)
    b3s = jnp.stack([h[2][1] for h in heads])
    pad = max(num_obj * od for od in out_dims)
    k4s = jnp.stack([jnp.pad(h[3][0], [(0, 0), (0, pad - h[3][0].shape[1])])
                     for h in heads])                   # (3, 128, pad)
    b4s = jnp.stack([jnp.pad(h[3][1], [(0, pad - h[3][1].shape[0])])
                     for h in heads])

    def stacked(feat, k1, b1, k2s, b2s, k3s, b3s, k4s, b4s, obj):
        y = nn.relu(feat @ k1 + b1)                     # (B, N, 1920)
        y = y.reshape(y.shape[0], y.shape[1], 3, 640)
        y = nn.relu(jnp.einsum("bnhw,hwd->bnhd", y, k2s) + b2s)
        y = nn.relu(jnp.einsum("bnhw,hwd->bnhd", y, k3s) + b3s)
        y = jnp.einsum("bnhw,hwd->bnhd", y, k4s) + b4s  # (B, N, 3, pad)
        s = 0.0
        for idx, od in enumerate(out_dims):
            x = y[:, :, idx, :num_obj * od]
            x = x.reshape(x.shape[:-1] + (num_obj, od))
            s = s + select_object(x, obj).astype(jnp.float32).mean()
        return s

    timeit("heads_stacked_select", stacked, feat, k1, b1, k2s, b2s, k3s, b3s,
           k4s, b4s, obj)

    # f32 heads for contrast (is bf16 hurting the big matmul?)
    featf = feat.astype(jnp.float32)
    headsf = jax.tree.map(lambda a: a.astype(jnp.float32), heads)
    k1f, b1f = k1.astype(jnp.float32), b1.astype(jnp.float32)
    timeit("heads_full_f32", full, featf, k1f, b1f, headsf)

    # ---- new sparse tail vs old, inside the full CNN ----
    img = jax.random.normal(key, (b, crop, crop, 3), jnp.float32)
    pts = jax.random.normal(key, (b, n_pts, 3), jnp.float32) * 0.05
    choose = jax.random.randint(key, (b, n_pts), 0, crop * crop,
                                dtype=jnp.int32)
    posenet = PoseNet(num_obj=num_obj, dtype=bf)
    refiner = PoseRefineNet(num_obj=num_obj, dtype=bf)
    pp = jax.jit(posenet.init)(key, img, pts, choose, obj)
    out0 = jax.jit(posenet.apply)(pp, img, pts, choose, obj)
    rp = jax.jit(refiner.init)(key, pts, out0["emb"], obj)

    def cnn_sparse(cp, img, choose):
        m = PSPNet(dtype=bf)
        emb = m.apply({"params": cp}, img, sample_at=choose)
        return emb.mean()

    timeit("cnn_sparse_new", cnn_sparse, pp["params"]["cnn"], img, choose)

    def posenet_full(pp, img, pts, choose, obj):
        out = posenet.apply(pp, img, pts, choose, obj)
        return out["pred_r"].mean() + out["pred_t"].mean() + \
            out["pred_c"].mean()

    timeit("posenet_full_new", posenet_full, pp, img, pts, choose, obj)

    pipe = InferencePipeline(posenet, refiner, refine_iters=2)

    def run(pp, rp, i, p, c, o):
        q, t, _ = pipe._infer(pp, rp, i, p, c, o)
        return q.mean() + t.mean()

    timeit("pipeline_r2_new", run, pp, rp, img, pts, choose, obj)
    record("pipeline_r2_new_fps",
           round(b / results["pipeline_r2_new_ms"] * 1e3, 1))

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
