"""Phase-2 (refine) step decomposition at the YCB curriculum tail shape
(VERDICT r4 item 4: the driver's ``refine_step_ms_b32_M2600`` = 338 ms was
7x the phase-1 bf16 step and unexamined — the curriculum spends its whole
second half there, ``tools/train.py:225-251``).

At b=32, N=1000 hypotheses, M=2600 mesh/target points, 192px, 2 refiner
iterations (``train/steps.py:make_refine_train_step``), this isolates:

  * the full refine step in f32 (reproduces the driver key) AND in bf16 —
    the r4 "7x" compared an f32 phase-2 step against the bf16 phase-1
    number, so part of the gap is numerics, not structure; the real
    ``--bf16`` training run computes BOTH phases in bf16
  * frozen PoseNet fwd alone (no grad — phase 2 never differentiates it)
  * fwd + phase-2 pose_loss value (adds the N=1000 x M=2600 fused
    hypothesis distance + per-hypothesis argmin re-pose)
  * refiner-only value_and_grad with precomputed emb/new_points/new_target,
    at 1/2/4 iterations (iteration-count scaling of the trained part)
  * one refiner_loss value at M=500 vs M=2600 (the KNN remap + fused
    distance's own M-scaling, separate from the model)

    nohup python examples/tpu_refine_decomp.py > /tmp/refine_decomp.log 2>&1 &
"""

import json
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


def make_batch(rng, b, n, m, crop, num_obj):
    from densefusion_tpu.data import PoseSample
    return PoseSample(
        points=rng.standard_normal((b, n, 3)).astype(np.float32) * 0.05,
        choose=rng.integers(0, crop * crop, (b, n)).astype(np.int32),
        img=rng.standard_normal((b, crop, crop, 3)).astype(np.float32),
        target=rng.standard_normal((b, m, 3)).astype(np.float32) * 0.05,
        model_points=rng.standard_normal((b, m, 3)).astype(np.float32) * 0.05,
        obj_idx=rng.integers(0, num_obj, (b,)).astype(np.int32),
        sym=(np.arange(b) < 8), valid=np.ones((b,), bool),
    )


def full_step_ms(dtype, batch, results, tag):
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.train import create_train_state
    from densefusion_tpu.train.steps import make_refine_train_step
    from densefusion_tpu.train.state import make_optimizer
    from densefusion_tpu.utils.config import RunConfig

    cfg = RunConfig.preset("ycb")
    posenet = PoseNet(num_obj=21, dtype=dtype)
    refiner = PoseRefineNet(num_obj=21, dtype=dtype)
    state = create_train_state(posenet, refiner, cfg, jax.random.key(0),
                               batch)
    tx = make_optimizer(cfg.lr)
    state = state.replace(opt_state=tx.init(state.params_refine))
    step = make_refine_train_step(posenet, refiner, tx, refine_iters=2)
    w = np.float32(0.015)

    # the step donates its state argument: time via repeated chained calls
    s, metrics = step(state, batch, w)
    sync(metrics["loss"])
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        s, metrics = step(s, batch, w)
    sync(metrics["loss"])
    ms = (time.perf_counter() - t0) / reps * 1e3
    results[f"refine_step_ms_{tag}"] = round(ms, 2)
    print(f"full refine step [{tag}]: {ms:.1f} ms", flush=True)


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true",
                   help="tiny-shape CPU wiring check (no timing value)")
    args = p.parse_args(argv)

    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.losses.pose_loss import pose_loss, refiner_loss
    from densefusion_tpu.utils import enable_persistent_compilation_cache

    # the b=32 M=2600 refine-step compiles are multi-minute on the tunnel;
    # cache them so an interrupted probe resumes at timing speed
    enable_persistent_compilation_cache()

    b, n, m, crop, num_obj = 32, 1000, 2600, 192, 21
    if args.smoke:
        b, n, m, crop, num_obj = 2, 64, 96, 64, 3
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    results: dict = {"shape": {"b": b, "n": n, "m": m, "crop": crop}}

    batch = make_batch(rng, b, n, m, crop, num_obj)

    # -- full step, f32 (the driver key) and bf16 (what --bf16 trains) -----
    full_step_ms(None, batch, results, "f32")
    full_step_ms(jnp.bfloat16, batch, results, "bf16")

    # components are measured on the bf16 config (the recommendation);
    # fresh models/state — full_step_ms donated its state to the jit
    from densefusion_tpu.train import create_train_state
    from densefusion_tpu.utils.config import RunConfig
    posenet = PoseNet(num_obj=num_obj, dtype=jnp.bfloat16)
    refiner = PoseRefineNet(num_obj=num_obj, dtype=jnp.bfloat16)
    state = create_train_state(posenet, refiner, RunConfig.preset("ycb"),
                               jax.random.key(0), batch)
    params_pose = state.params_pose
    params_refine = state.params_refine
    img = jnp.asarray(batch.img)
    pts = jnp.asarray(batch.points)
    choose = jnp.asarray(batch.choose)
    obj = jnp.asarray(batch.obj_idx)
    target = jnp.asarray(batch.target)
    model_points = jnp.asarray(batch.model_points)
    sym = jnp.asarray(batch.sym)
    valid = jnp.asarray(batch.valid, jnp.float32)
    w = jnp.float32(0.015)

    fwd = jax.jit(lambda p: posenet.apply(p, img, pts, choose, obj,
                                          train=False))
    results["posenet_fwd_ms"] = round(bench(fwd, params_pose), 2)
    print(f"posenet fwd: {results['posenet_fwd_ms']} ms", flush=True)

    def fwd_loss(p):
        out = posenet.apply(p, img, pts, choose, obj, train=False)
        lo = pose_loss(out["pred_r"], out["pred_t"], out["pred_c"],
                       target, model_points, pts, sym, w, use_adds=False,
                       sample_weight=valid,
                       pred_c_logit=out.get("pred_c_logit"))
        return lo.loss, lo.new_points, lo.new_target, out["emb"]
    jfwd_loss = jax.jit(fwd_loss)
    results["posenet_fwd_plus_loss_ms"] = round(
        bench(jfwd_loss, params_pose), 2)
    print(f"posenet fwd + phase-2 pose_loss: "
          f"{results['posenet_fwd_plus_loss_ms']} ms", flush=True)

    _, new_points, new_target, emb = jax.tree.map(
        jnp.asarray, jfwd_loss(params_pose))

    def refiner_grad(iters):
        def loss_fn(pr):
            total = 0.0
            p_, t_ = new_points, new_target
            for _ in range(iters):
                res = refiner.apply(pr, p_, emb, obj)
                rl = refiner_loss(res["pred_r"], res["pred_t"], t_,
                                  model_points, p_, sym, use_adds=True,
                                  sample_weight=valid)
                total = total + rl.loss
                p_, t_ = rl.new_points, rl.new_target
            return total
        return jax.jit(jax.value_and_grad(loss_fn))

    for iters in (1, 2, 4):
        ms = bench(refiner_grad(iters), params_refine)
        results[f"refiner_grad_ms_iters{iters}"] = round(ms, 2)
        print(f"refiner-only value_and_grad x{iters}: {ms:.1f} ms",
              flush=True)

    # -- the loss stage's own M scaling (KNN remap + fused distance) -------
    res1 = jax.jit(lambda pr: refiner.apply(pr, new_points, emb, obj))(
        params_refine)
    pred_r, pred_t = jnp.asarray(res1["pred_r"]), jnp.asarray(res1["pred_t"])
    for mm in ((32, 96) if args.smoke else (500, 2600)):
        tgt = jnp.asarray(
            rng.standard_normal((b, mm, 3)).astype(np.float32) * 0.05)
        mdl = jnp.asarray(
            rng.standard_normal((b, mm, 3)).astype(np.float32) * 0.05)
        f = jax.jit(lambda r_, t_, tg, md: refiner_loss(
            r_, t_, tg, md, new_points, sym, use_adds=True,
            sample_weight=valid).loss)
        ms = bench(f, pred_r, pred_t, tgt, mdl)
        results[f"refiner_loss_value_ms_M{mm}"] = round(ms, 2)
        print(f"refiner_loss value at M={mm}: {ms:.2f} ms", flush=True)

    print(json.dumps(results, indent=2))
    with open("/tmp/refine_decomp.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
