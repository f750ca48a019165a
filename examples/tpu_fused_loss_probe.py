"""Validate + time the fused differentiable ADD-S path on real TPU.

Round-2c follow-up: the symmetric loss now consumes the remap kernel's
winning score directly (``adds_min_sqdist_minus_qsq``) instead of
materializing the remapped (B, N, M, 3) targets. This probe:

  1. checks pallas-vs-XLA parity of the fused op (value + custom-VJP grad)
     on the real chip,
  2. times loss fwd/grad at batch 32 (all-sym and 25%-sym) against the
     round-2c baselines (loss grad 65 ms, 40 ms of distance machinery),
  3. times the composite device-side model+loss grad (was 98 ms/batch-32).

    nohup python examples/tpu_fused_loss_probe.py > /tmp/fused_probe.log 2>&1 &
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
    from densefusion_tpu.ops.knn import adds_min_sqdist_minus_qsq

    b, n, m, crop, num_obj = 32, 1000, 500, 192, 21
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    # -- 1. fused-op parity on chip ---------------------------------------
    pred = jnp.asarray(rng.standard_normal((4, 2000, 3)) * 0.05, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((4, 500, 3)) * 0.05, jnp.float32)
    act = jnp.asarray([True, False, True, True])

    def total(backend):
        def f(p):
            dm = adds_min_sqdist_minus_qsq(p, tgt, act, backend)
            return jnp.sum(dm + jnp.sum(p * p, -1) * act[:, None])
        return jax.jit(f), jax.jit(jax.grad(f))

    (fp, gp), (fx, gx) = total("pallas"), total("xla")
    vp, vx = sync(fp(pred)), sync(fx(pred))
    print(f"value pallas={vp:.6f} xla={vx:.6f} "
          f"rel={abs(vp - vx) / abs(vx):.2e}", flush=True)
    gpv, gxv = sync(gp(pred)), sync(gx(pred))
    gerr = np.max(np.abs(gpv - gxv)) / (np.max(np.abs(gxv)) + 1e-12)
    print(f"grad  max-rel-err={gerr:.2e}  finite={np.all(np.isfinite(gpv))}",
          flush=True)

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


if __name__ == "__main__":
    main()
