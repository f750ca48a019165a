"""Decoder stage isolation bench: which part of the phase-conv upsample is
slow, and where dense PSPNet time actually goes. Long-lived process, scalar
syncs only."""

import argparse
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/decoder_bench2.json")
    args = ap.parse_args()
    results = {}

    import jax
    import jax.numpy as jnp
    from densefusion_tpu.models.layers import (
        phase_upsample_conv3x3, resize_bilinear,
        UPSAMPLE_TAPS_EVEN, UPSAMPLE_TAPS_ODD,
    )

    def record(k, v):
        results[k] = v
        print(k, v, flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    t0 = time.time()
    _ = np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    record("session_setup_s", time.time() - t0)

    key = jax.random.key(0)
    B = 64

    def timeit(tag, fn, *arrs, iters=30):
        jfn = jax.jit(fn)
        t0 = time.time()
        np.asarray(jfn(*arrs))
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        outs = []
        for _ in range(iters):
            outs.append(jfn(*arrs))
        np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / iters * 1e3
        record(tag, round(dt, 3))
        record(tag + "_compile", round(compile_s, 1))
        return dt

    # ---- stage variants --------------------------------------------------
    for (h, w, cin, cout) in [(24, 24, 1024, 256), (48, 48, 256, 64),
                              (96, 96, 64, 64)]:
        x = jax.random.normal(key, (B, h, w, cin), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
        bias = jnp.zeros((cout,), jnp.bfloat16)
        name = f"s{h}x{cin}to{cout}"

        def dense(x, k, bias):
            u = resize_bilinear(x, (2 * h, 2 * w))
            u = jnp.pad(u, [(0, 0), (1, 1), (1, 1), (0, 0)])
            return (jax.lax.conv_general_dilated(
                u, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias).mean()

        def resize_only(x):
            return resize_bilinear(x, (2 * h, 2 * w)).mean()

        def fused_full(x, k, bias):
            return phase_upsample_conv3x3(x, k, bias).mean()

        def phase_core(x, k, bias, d2s=True):
            m_even = jnp.asarray(UPSAMPLE_TAPS_EVEN, k.dtype)
            m_odd = jnp.asarray(UPSAMPLE_TAPS_ODD, k.dtype)
            m = jnp.stack([m_even, m_odd])
            pk = jnp.einsum("pti,quj,tucd->pqijcd", m, m, k)
            pk = pk.transpose(2, 3, 4, 0, 1, 5).reshape(3, 3, cin, 4 * cout)
            xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
            y = jax.lax.conv_general_dilated(
                xp, pk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + jnp.tile(bias, 4)
            if d2s:
                y = y.reshape(B, h, w, 2, 2, cout)
                y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * h, 2 * w,
                                                          cout)
            return y.mean()

        timeit(f"{name}_dense", dense, x, k, bias)
        timeit(f"{name}_resize_only", resize_only, x)
        timeit(f"{name}_fused_full", fused_full, x, k, bias)
        timeit(f"{name}_fused_nocorr", functools.partial(phase_core, d2s=True),
               x, k, bias)
        timeit(f"{name}_fused_nod2s", functools.partial(phase_core, d2s=False),
               x, k, bias)

    # ---- dense PSPNet cumulative stage timings ---------------------------
    from densefusion_tpu.models.pspnet import PSPNet
    crop = 192
    img = jax.random.normal(key, (B, crop, crop, 3), jnp.float32)
    model = PSPNet(dtype=jnp.bfloat16, fused_decoder=False)
    variables = jax.jit(model.init)(key, img)

    from densefusion_tpu.models.resnet import DilatedResNet
    from densefusion_tpu.models.pspnet import PSPModule, PSPUpsample

    trunk = DilatedResNet(dtype=jnp.bfloat16)

    def trunk_only(p, img):
        f, _ = trunk.apply({"params": p["params"]["trunk"]}, img)
        return f.astype(jnp.float32).mean()

    timeit("pspnet_trunk_only", trunk_only, variables, img)

    psp = PSPModule(dtype=jnp.bfloat16)

    def trunk_psp(p, img):
        f, _ = trunk.apply({"params": p["params"]["trunk"]}, img)
        y = psp.apply({"params": p["params"]["psp"]}, f)
        return y.astype(jnp.float32).mean()

    timeit("pspnet_trunk_psp", trunk_psp, variables, img)

    up1 = PSPUpsample(256, dtype=jnp.bfloat16, fused=False)
    up2 = PSPUpsample(64, dtype=jnp.bfloat16, fused=False)

    def upto_up1(p, img):
        f, _ = trunk.apply({"params": p["params"]["trunk"]}, img)
        y = psp.apply({"params": p["params"]["psp"]}, f)
        y = up1.apply({"params": p["params"]["up1"]}, y)
        return y.astype(jnp.float32).mean()

    timeit("pspnet_upto_up1", upto_up1, variables, img)

    def upto_up2(p, img):
        f, _ = trunk.apply({"params": p["params"]["trunk"]}, img)
        y = psp.apply({"params": p["params"]["psp"]}, f)
        y = up1.apply({"params": p["params"]["up1"]}, y)
        y = up2.apply({"params": p["params"]["up2"]}, y)
        return y.astype(jnp.float32).mean()

    timeit("pspnet_upto_up2", upto_up2, variables, img)

    def full(p, img):
        return model.apply(p, img).mean()

    timeit("pspnet_full_dense", full, variables, img)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
