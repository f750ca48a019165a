"""Stage-level BACKWARD decomposition of the PoseNet train step (batch 32,
bf16 compute) — where do the ~36 ms of model grad go?

Isolates grad-time of: trunk only, trunk+psp, full CNN (sparse decode),
fusion+heads given a fixed emb, and the sparse-gather tail alone.

    nohup python examples/tpu_train_decomp2.py > /tmp/train_decomp2.log 2>&1 &
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(x)


def bench(fn, *args, repeats=10):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0].reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0].reshape(-1)[:1])
    return (time.perf_counter() - t0) / repeats * 1e3


def main():
    import flax.linen as nn
    from densefusion_tpu.models import PoseNet
    from densefusion_tpu.models.pspnet import PSPNet, PSPModule
    from densefusion_tpu.models.resnet import DilatedResNet
    from densefusion_tpu.models.posenet import (
        DenseFusionFeat, _HeadParams, apply_head_stacks,
    )

    b, n, crop, num_obj, emb_dim = 32, 1000, 192, 21, 32
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    img = jnp.asarray(rng.standard_normal((b, crop, crop, 3)), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((b, n, 3)) * 0.05, jnp.float32)
    choose = jnp.asarray(rng.integers(0, crop * crop, (b, n)), jnp.int32)
    obj = jnp.asarray(rng.integers(0, num_obj, (b,)), jnp.int32)

    def gradtime(name, model, *args, method=None):
        params = jax.jit(model.init)(jax.random.key(0), *args)

        def f(p):
            out = model.apply(p, *args)
            return jnp.sum(jnp.asarray(
                [jnp.sum(x.astype(jnp.float32) ** 2)
                 for x in jax.tree.leaves(out)]))
        ms_g = bench(jax.jit(jax.grad(f)), params)
        ms_f = bench(jax.jit(f), params)
        print(f"{name:24s} grad {ms_g:7.2f} ms   fwd {ms_f:7.2f} ms",
              flush=True)

    gradtime("trunk", DilatedResNet(dtype=dt), img)

    class TrunkPSP(nn.Module):
        @nn.compact
        def __call__(self, x):
            f, _ = DilatedResNet(dtype=dt, name="trunk")(x)
            return PSPModule(dtype=dt, name="psp")(f)
    gradtime("trunk+psp", TrunkPSP(), img)

    class CNNSparse(nn.Module):
        @nn.compact
        def __call__(self, x, sample_at):
            return PSPNet(dtype=dt, name="c")(x, sample_at=sample_at)
    gradtime("cnn sparse", CNNSparse(), img, choose)
    gradtime("cnn dense", PSPNet(dtype=dt), img)

    class FusionHeads(nn.Module):
        @nn.compact
        def __call__(self, points, emb, obj):
            feat = DenseFusionFeat(dtype=dt, name="fusion")(points, emb)
            heads = [
                _HeadParams(num_obj, 4, identity_quat_bias=True,
                            name="head_r")(feat.shape[-1]),
                _HeadParams(num_obj, 3, name="head_t")(feat.shape[-1]),
                _HeadParams(num_obj, 1, name="head_c")(feat.shape[-1]),
            ]
            rx, tx, cx = apply_head_stacks(feat, heads, num_obj, (4, 3, 1),
                                           dtype=dt, obj=obj)
            return rx, tx, cx
    emb = jnp.asarray(rng.standard_normal((b, n, emb_dim)), jnp.float32)
    gradtime("fusion+heads", FusionHeads(), pts, emb, obj)

    # sparse tail alone: phase conv + row gather + phase select + final
    class SparseTail(nn.Module):
        @nn.compact
        def __call__(self, p, sample_at):
            from densefusion_tpu.models.layers import phase_conv_phases, PReLU
            from densefusion_tpu.models.pspnet import _Conv3x3Params
            k, bias = _Conv3x3Params(64, name="up3_conv")(p.shape[-1])
            k, bias = k.astype(dt), bias.astype(dt)
            rows = sample_at // crop
            cols = sample_at % crop
            b_, hh, ww = p.shape[0], p.shape[1], p.shape[2]
            y4 = phase_conv_phases(p.astype(dt), k, bias)
            base = ((rows // 2) * ww + cols // 2).astype(jnp.int32)
            g = jnp.take_along_axis(y4.reshape(b_, hh * ww, 256),
                                    base[..., None], axis=1)
            g = PReLU(name="up3_prelu")(g)
            ph = jax.nn.one_hot((rows % 2) * 2 + (cols % 2), 4, dtype=g.dtype)
            g = jnp.einsum("bnpc,bnp->bnc", g.reshape(b_, n, 4, 64), ph)
            return nn.Dense(emb_dim, name="final", dtype=dt)(g)
    half = jnp.asarray(rng.standard_normal((b, crop // 2, crop // 2, 64)),
                       jnp.float32)
    gradtime("sparse tail", SparseTail(), half, choose)


if __name__ == "__main__":
    main()
