"""Decompose the pose train step's device time: model grad vs loss terms
(ADD-S remap kernel, remap gather, hypothesis distance reductions).

    nohup python examples/tpu_train_probe.py > /tmp/train_probe.log 2>&1 &
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(x)


def bench(fn, *args, repeats=10):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / repeats


def main():
    from densefusion_tpu.models import PoseNet
    from densefusion_tpu.losses.pose_loss import pose_loss
    from densefusion_tpu.ops.knn import nearest_neighbor_pallas_batched
    from densefusion_tpu.ops import adds_remap_targets

    b, n, m, crop, num_obj = 8, 1000, 500, 192, 21
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((b, crop, crop, 3)), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((b, n, 3)) * 0.05, jnp.float32)
    choose = jnp.asarray(rng.integers(0, crop * crop, (b, n)), jnp.int32)
    obj = jnp.asarray(rng.integers(0, num_obj, (b,)), jnp.int32)
    target = jnp.asarray(rng.standard_normal((b, m, 3)) * 0.05, jnp.float32)
    model = jnp.asarray(rng.standard_normal((b, m, 3)) * 0.05, jnp.float32)
    sym = jnp.zeros((b,), bool)
    w = jnp.float32(0.015)

    posenet = PoseNet(num_obj=num_obj)
    params = jax.jit(posenet.init)(jax.random.key(0), img, pts, choose, obj)

    # 1. posenet forward / grad with a remap-free surrogate loss
    @jax.jit
    def net_fwd(p):
        out = posenet.apply(p, img, pts, choose, obj, train=True,
                            rngs={"dropout": jax.random.key(1)})
        return out["pred_r"].sum() + out["pred_t"].sum() + out["pred_c"].sum()

    print(f"net fwd:            {bench(net_fwd, params)*1e3:8.2f} ms",
          flush=True)
    g = jax.jit(jax.grad(net_fwd))
    print(f"net grad:           {bench(g, params)*1e3:8.2f} ms", flush=True)

    # 2. loss only (taking net outputs as leaves), adds on/off, fwd and grad
    out = jax.jit(lambda p: posenet.apply(
        p, img, pts, choose, obj, train=True,
        rngs={"dropout": jax.random.key(1)}))(params)
    pr, pt, pc = (jax.device_put(np.asarray(out[k]))
                  for k in ("pred_r", "pred_t", "pred_c"))

    for use_adds in (False, True):
        def loss_fn(pr_, pt_, pc_):
            return pose_loss(pr_, pt_, pc_, target, model, pts, sym, w,
                             use_adds=use_adds).loss
        f = jax.jit(loss_fn)
        print(f"loss fwd  adds={use_adds!s:5}: {bench(f, pr, pt, pc)*1e3:8.2f}"
              " ms", flush=True)
        fg = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
        print(f"loss grad adds={use_adds!s:5}: "
              f"{bench(fg, pr, pt, pc)*1e3:8.2f} ms", flush=True)

    # 3. remap pieces: kernel alone, then remap incl. gather
    pred = jnp.asarray(rng.standard_normal((b, n * m, 3)) * 0.05, jnp.float32)
    t = bench(jax.jit(nearest_neighbor_pallas_batched), pred, target)
    print(f"nn kernel alone:    {t*1e3:8.2f} ms", flush=True)

    t = bench(jax.jit(lambda p, tg: adds_remap_targets(p, tg)), pred, target)
    print(f"remap (kernel+gather): {t*1e3:8.2f} ms", flush=True)

    # 4. the gather alone
    idx = jnp.asarray(rng.integers(0, m, (b, n * m)), jnp.int32)

    @jax.jit
    def gather_only(tg, ix):
        return jnp.take_along_axis(tg, ix[..., None], axis=-2)

    print(f"gather alone:       {bench(gather_only, target, idx)*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
