"""Trunk sub-stage decomposition + remaining-stage probes.

Where do the trunk's 6.7 ms go (roofline ~4.9), and is anything left in
up1 / fusion / refiner worth chasing? Methodology per docs/PERF.md.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/trunk_bench.json")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()
    results = {}

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from densefusion_tpu.models.resnet import DilatedResNet, BasicBlock
    from densefusion_tpu.models.layers import he_normal_fan_out

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
    img = jax.random.normal(key, (b, 192, 192, 3), jnp.float32)

    trunk = DilatedResNet(variant="resnet18", dtype=bf)
    tp = jax.jit(trunk.init)(key, img)

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

    # cumulative prefixes through the trunk via param surgery:
    # rebuild the stem + N stages manually from the same params
    P = tp["params"]

    def stem_only(P, img):
        x = img.astype(bf)
        k = P["stem"]["kernel"].astype(bf)
        x = jax.lax.conv_general_dilated(
            x, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return x.astype(jnp.float32).mean()

    timeit("stem_maxpool", stem_only, P, img)

    stage_args = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]

    def prefix(n_stages):
        def fn(P, img):
            x = img.astype(bf)
            k = P["stem"]["kernel"].astype(bf)
            x = jax.lax.conv_general_dilated(
                x, k, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])
            for s in range(n_stages):
                features, stride, dilation = stage_args[s]
                for bb in range(2):
                    blk = BasicBlock(features=features, dtype=bf,
                                     stride=stride if bb == 0 else 1,
                                     dilation=1 if bb == 0 else dilation)
                    x = blk.apply(
                        {"params": P[f"stage{s + 1}_block{bb}"]}, x)
            return x.astype(jnp.float32).mean()
        return fn

    for s in (1, 2, 3, 4):
        timeit(f"stages_{s}", prefix(s), P, img)

    # f32 image handoff: does casting on-device cost anything? feed bf16
    imgb = img.astype(bf)
    timeit("stages_4_bf16in", prefix(4), P, imgb)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
