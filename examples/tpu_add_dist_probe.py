"""Validate + time the fully-fused ADD/ADD-S hypothesis distance on TPU.

Round-2d: `ops.add_dist.hypothesis_mean_dist` generates the transformed
cloud in-kernel (the (B, N, M, 3) pred tensor never exists in HBM) and
emits its own gradient coefficients, so the loss backward is a pointwise
multiply. This probe:

  1. checks pallas-vs-XLA parity of the fused op (value + custom-VJP grad)
     on the real chip at the training shape,
  2. times loss fwd/grad at batch 32 (sym=0/8/32 of 32) against the
     round-2c baselines (loss grad 65 ms all-sym; ~40 ms distance machinery),
  3. times the composite device-side model+loss grad (was 73 ms/batch-32),
  4. times the refine-phase shape (N=1 hypothesis, M=2600 mesh points).

    nohup python examples/tpu_add_dist_probe.py > /tmp/add_dist_probe.log 2>&1 &
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
    from densefusion_tpu.losses.pose_loss import pose_loss, refiner_loss
    from densefusion_tpu.ops.add_dist import (
        hypothesis_mean_dist_xla, _fused_mean_dist)
    from densefusion_tpu.geometry import quat_to_matrix, random_quaternion

    b, n, m, crop, num_obj = 32, 1000, 500, 192, 21
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    # -- 1. fused-op parity on chip ---------------------------------------
    bb, nn, mm = 4, 64, 37
    q = random_quaternion(jax.random.key(11), (bb, nn))
    R = quat_to_matrix(q)
    t = jnp.asarray(rng.uniform(-0.3, 0.3, (bb, nn, 3)), jnp.float32)
    mdl = jnp.asarray(rng.uniform(-0.05, 0.05, (bb, mm, 3)), jnp.float32)
    tgt = mdl @ jnp.swapaxes(quat_to_matrix(
        random_quaternion(jax.random.key(3), (bb,))), -1, -2) \
        + jnp.asarray(rng.uniform(-0.3, 0.3, (bb, 1, 3)), jnp.float32)
    sym4 = jnp.asarray([True, False, True, False])
    wgt = jnp.asarray(rng.uniform(0.2, 1.0, (bb, nn)), jnp.float32)

    def total(fused):
        def f(R_, t_):
            d = (_fused_mean_dist(R_, t_, mdl, tgt, sym4, True) if fused
                 else hypothesis_mean_dist_xla(R_, t_, mdl, tgt, sym4, True))
            return jnp.sum(d * wgt)
        return jax.jit(f), jax.jit(jax.grad(f, argnums=(0, 1)))

    (fp, gp), (fx, gx) = total(True), total(False)
    vp, vx = sync(fp(R, t)), sync(fx(R, t))
    print(f"value pallas={vp:.6f} xla={vx:.6f} "
          f"rel={abs(vp - vx) / abs(vx):.2e}", flush=True)
    gpv, gxv = gp(R, t), gx(R, t)
    for name, a, bref in (("dR", gpv[0], gxv[0]), ("dt", gpv[1], gxv[1])):
        a, bref = sync(a), sync(bref)
        err = np.max(np.abs(a - bref)) / (np.max(np.abs(bref)) + 1e-12)
        print(f"grad {name} max-rel-err={err:.2e} "
              f"finite={np.all(np.isfinite(a))}", flush=True)

    # -- 2. loss-only timings at batch 32 ----------------------------------
    pts = jnp.asarray(rng.standard_normal((b, n, 3)) * 0.05, jnp.float32)
    target = jnp.asarray(rng.standard_normal((b, m, 3)) * 0.05, jnp.float32)
    model = jnp.asarray(rng.standard_normal((b, m, 3)) * 0.05, jnp.float32)
    pr = jnp.asarray(rng.standard_normal((b, n, 4)), jnp.float32)
    pt = jnp.asarray(rng.standard_normal((b, n, 3)) * 0.05, jnp.float32)
    pc = jnp.asarray(rng.uniform(0.1, 1.0, (b, n)), jnp.float32)
    w = jnp.float32(0.015)

    for name, sym in (("sym=0/32", jnp.zeros((b,), bool)),
                      ("sym=8/32", jnp.arange(b) < 8),
                      ("sym=32/32", jnp.ones((b,), bool))):
        def loss_fn(pr_, pt_, pc_):
            return pose_loss(pr_, pt_, pc_, target, model, pts, sym, w,
                             use_adds=True).loss
        f = jax.jit(loss_fn)
        fg = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
        print(f"loss fwd  {name}: {bench(f, pr, pt, pc)*1e3:8.2f} ms",
              flush=True)
        print(f"loss grad {name}: {bench(fg, pr, pt, pc)*1e3:8.2f} ms",
              flush=True)

    # -- 3. composite model+loss grad (device-side, inputs resident) -------
    img = jnp.asarray(rng.standard_normal((b, crop, crop, 3)), jnp.float32)
    choose = jnp.asarray(rng.integers(0, crop * crop, (b, n)), jnp.int32)
    obj = jnp.asarray(rng.integers(0, num_obj, (b,)), jnp.int32)
    sym = jnp.arange(b) < 8
    posenet = PoseNet(num_obj=num_obj)
    params = jax.jit(posenet.init)(jax.random.key(0), img, pts, choose, obj)

    def step_loss(p):
        out = posenet.apply(p, img, pts, choose, obj, train=True,
                            rngs={"dropout": jax.random.key(1)})
        return pose_loss(out["pred_r"], out["pred_t"], out["pred_c"],
                         target, model, pts, sym, w, use_adds=True).loss

    g = jax.jit(jax.grad(step_loss))
    print(f"model+loss grad b32 (sym=8/32): {bench(g, params)*1e3:8.2f} ms",
          flush=True)

    # -- 4. refine-phase loss shape (N=1, M=2600) ---------------------------
    m_ref = 2600
    tgt_r = jnp.asarray(rng.standard_normal((b, m_ref, 3)) * 0.05, jnp.float32)
    mdl_r = jnp.asarray(rng.standard_normal((b, m_ref, 3)) * 0.05, jnp.float32)
    pr1 = jnp.asarray(rng.standard_normal((b, 4)), jnp.float32)
    pt1 = jnp.asarray(rng.standard_normal((b, 3)) * 0.05, jnp.float32)
    for name, symr in (("sym=8/32", jnp.arange(b) < 8),
                       ("sym=32/32", jnp.ones((b,), bool))):
        def rloss(pr_, pt_):
            return refiner_loss(pr_, pt_, tgt_r, mdl_r, pts, symr).loss
        fg = jax.jit(jax.grad(rloss, argnums=(0, 1)))
        print(f"refiner loss grad M=2600 {name}: "
              f"{bench(fg, pr1, pt1)*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
