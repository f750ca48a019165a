"""Train-step decomposition at batch 32 (VERDICT r2 item 8: push the
device-side model+loss grad under 45 ms).

Round 2d left the composite at 53.5 ms with the loss at ~14.6 ms (8/32 sym)
— the model fwd+grad is the bulk. This probe isolates, at the flagship YCB
training shape (b32, N=1000, M=500, 192px, f32 params):

  * full model+loss grad under each structural variant:
      - sparse vs dense decode (sparse's backward is a scatter-add of N rows
        into the half-res phase map — gathers were the round-2 story, their
        TRANSPOSES may be this round's)
      - remat_cnn on/off
      - bf16 compute (params f32, activations bf16)
  * model-only grad (loss swapped for a cheap readout) and loss-only grad,
    so the split is explicit.

    nohup python examples/tpu_train_decomp.py > /tmp/train_decomp.log 2>&1 &
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
    from densefusion_tpu.models import PoseNet
    from densefusion_tpu.losses.pose_loss import pose_loss

    b, n, m, crop, num_obj = 32, 1000, 500, 192, 21
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    img = jnp.asarray(rng.standard_normal((b, crop, crop, 3)), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((b, n, 3)) * 0.05, jnp.float32)
    choose = jnp.asarray(rng.integers(0, crop * crop, (b, n)), jnp.int32)
    obj = jnp.asarray(rng.integers(0, num_obj, (b,)), jnp.int32)
    target = jnp.asarray(rng.standard_normal((b, m, 3)) * 0.05, jnp.float32)
    model = jnp.asarray(rng.standard_normal((b, m, 3)) * 0.05, jnp.float32)
    sym = jnp.arange(b) < 8
    w = jnp.float32(0.015)

    variants = {
        "base(sparse,f32)": dict(),
        "dense_decode": dict(sparse_emb=False),
        "remat": dict(remat_cnn=True),
        "bf16": dict(dtype=jnp.bfloat16),
        "bf16+dense": dict(dtype=jnp.bfloat16, sparse_emb=False),
        "bf16+remat": dict(dtype=jnp.bfloat16, remat_cnn=True),
    }

    params0 = None
    for name, kw in variants.items():
        posenet = PoseNet(num_obj=num_obj, **kw)
        if params0 is None:
            params0 = jax.jit(posenet.init)(jax.random.key(0), img, pts,
                                            choose, obj)
        params = params0  # same tree across variants

        def full_loss(p):
            out = posenet.apply(p, img, pts, choose, obj, train=True,
                                rngs={"dropout": jax.random.key(1)})
            return pose_loss(out["pred_r"], out["pred_t"], out["pred_c"],
                             target, model, pts, sym, w, use_adds=True).loss

        def model_only(p):
            out = posenet.apply(p, img, pts, choose, obj, train=True,
                                rngs={"dropout": jax.random.key(1)})
            return (jnp.sum(out["pred_r"] ** 2) + jnp.sum(out["pred_t"] ** 2)
                    + jnp.sum(out["pred_c"]))

        try:
            g_full = jax.jit(jax.grad(full_loss))
            ms_full = bench(g_full, params)
            g_model = jax.jit(jax.grad(model_only))
            ms_model = bench(g_model, params)
            f_fwd = jax.jit(full_loss)
            ms_fwd = bench(f_fwd, params)
            print(f"{name:18s} full_grad {ms_full:7.2f} ms   "
                  f"model_grad {ms_model:7.2f} ms   fwd {ms_fwd:7.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} ERROR {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
