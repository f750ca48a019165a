"""End-to-end benchmark + on-chip kernel guard.

Three sections, one JSON line:

1. **Inference throughput** (the headline `metric`): frames/s of the full
   jitted estimate + 2-iteration-refine program (YCB configuration: 21
   objects, 1000-point clouds, 192px crops, bf16 MXU compute), vs the
   reference's published ~0.06 s/frame (= 16.7 fps) GPU speed (BASELINE.md).
2. **Train story**: device-side model+loss gradient at batch 32 with the
   realistic 8/32 symmetric fraction through the fused ADD/ADD-S hypothesis
   distance, in BOTH numerics configs (`train_grad_ms_b32` f32 and
   `train_grad_ms_b32_bf16`, the measured recommendation), the phase-2
   refine step at the M=2600 curriculum shape (`refine_step_ms_b32_M2600`),
   the host loader's fork-ring samples/s (`loader_ring_samples_per_s`),
   and the stage-1 SegNet train/infer numbers (`seg_train_ms_b4`,
   `seg_infer_fps_b4`) — everything docs/PERF.md recommends is guarded
   every round. The headline fps is a median of 5 timed windows with
   `fps_spread` = [min, max] (tunnel transport varies round to round).
3. **Kernel parity smokes** (`kernel_parity` key): every Pallas kernel runs
   NON-interpreted on the real chip against its XLA reference — nn
   single/batched, ADD-S remap, fused min-distance (value+grad), hypothesis
   distance paired+min (value+grad), decoder conv3x3 — plus shard_map+Mosaic
   combined on a 1-device mesh (`sharded_hypothesis_mean_dist` with a
   gradient, `ring_nearest_neighbor`). A Mosaic lowering regression (the
   6c3dfb0 class, invisible to the CPU interpret-mode test suite) fails the
   bench: `kernel_parity` reports the failure and the process exits 1.

Methodology: requests are submitted pipelined (multiple batches in flight,
one device sync at the end) — the serving pattern — so a tunnel/dispatch RTT
is amortized rather than multiplied; every sync is a real host transfer of a
small output because `block_until_ready` can be a no-op on experimental
TPU-tunnel platforms.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 1.0 / 0.06  # reference: ~0.06 s/frame pose+refine (BASELINE.md)

# The TPU tunnel occasionally refuses sessions (UNAVAILABLE) for stretches;
# a failed backend init poisons the in-process JAX state, so retry by
# re-exec'ing a fresh interpreter a few times before giving up.
_MAX_INIT_RETRIES = 4
_RETRY_SLEEP_S = 240


def _ensure_backend():
    import jax
    try:
        jax.devices()
        return
    except RuntimeError as e:
        tries = int(os.environ.get("BENCH_INIT_RETRY", "0"))
        if tries >= _MAX_INIT_RETRIES:
            raise
        print(f"# backend init failed ({e}); retry {tries + 1}/"
              f"{_MAX_INIT_RETRIES} in {_RETRY_SLEEP_S}s", file=sys.stderr)
        time.sleep(_RETRY_SLEEP_S)
        os.environ["BENCH_INIT_RETRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def _sync(x):
    return np.asarray(x)


def kernel_parity_smokes() -> list[str]:
    """Run every Pallas kernel compiled (non-interpret) against its XLA
    reference; return a list of failure strings (empty = all parity)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from densefusion_tpu.ops import (
        nearest_neighbor, adds_remap_targets, conv3x3_valid,
        hypothesis_mean_dist, hypothesis_mean_dist_xla,
    )
    from densefusion_tpu.ops.knn import adds_min_sqdist_minus_qsq
    from densefusion_tpu.parallel.collectives import (
        sharded_hypothesis_mean_dist, ring_nearest_neighbor,
    )
    from densefusion_tpu.geometry import quat_to_matrix, random_quaternion

    rng = np.random.default_rng(7)
    fails: list[str] = []

    def check(name, got, want, tol=1e-4, exact=False):
        got, want = _sync(got), _sync(want)
        if not np.all(np.isfinite(got)):
            fails.append(f"{name}: non-finite output")
            return
        if exact:
            ok = np.array_equal(got, want)
        else:
            denom = max(float(np.max(np.abs(want))), 1e-12)
            ok = float(np.max(np.abs(got - want))) / denom <= tol
        if not ok:
            fails.append(f"{name}: mismatch vs XLA")

    def run(name, fn):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — any lowering error must fail
            fails.append(f"{name}: {type(e).__name__}: {str(e)[:200]}")

    # -- 1-NN, single (rank 2) and batched (rank 3, ragged sizes) ----------
    def nn_single():
        q = jnp.asarray(rng.standard_normal((600, 3)), jnp.float32)
        r = jnp.asarray(rng.standard_normal((250, 3)), jnp.float32)
        dp, ip = nearest_neighbor(q, r, backend="pallas")
        dx, ix = nearest_neighbor(q, r, backend="xla")
        check("nn_single_dist", dp, dx)
        check("nn_single_idx", ip, ix, exact=True)
    run("nn_single", nn_single)

    def nn_batched():
        q = jnp.asarray(rng.standard_normal((4, 700, 3)), jnp.float32)
        r = jnp.asarray(rng.standard_normal((4, 333, 3)), jnp.float32)
        dp, ip = nearest_neighbor(q, r, backend="pallas")
        dx, ix = nearest_neighbor(q, r, backend="xla")
        check("nn_batched_dist", dp, dx)
        check("nn_batched_idx", ip, ix, exact=True)
    run("nn_batched", nn_batched)

    # -- ADD-S remap (sym-gated scalar prefetch) ----------------------------
    def remap():
        p = jnp.asarray(rng.standard_normal((3, 900, 3)), jnp.float32)
        t = jnp.asarray(rng.standard_normal((3, 257, 3)), jnp.float32)
        act = jnp.asarray([True, False, True])
        got = adds_remap_targets(p, t, backend="pallas", active=act)
        want = adds_remap_targets(p, t, backend="xla", active=None)
        want = jnp.where(act[:, None, None], want, 0.0)
        check("remap", got, want)
    run("remap", remap)

    # -- fused differentiable min distance (value + custom-VJP grad) -------
    def min_sqdist():
        p = jnp.asarray(rng.standard_normal((2, 400, 3)), jnp.float32)
        t = jnp.asarray(rng.standard_normal((2, 120, 3)), jnp.float32)

        def total(backend):
            def f(p_):
                return jnp.sum(adds_min_sqdist_minus_qsq(p_, t, None,
                                                         backend))
            return jax.jit(f)(p), jax.jit(jax.grad(f))(p)
        (vp, gp), (vx, gx) = total("pallas"), total("xla")
        check("min_sqdist_val", vp, vx)
        check("min_sqdist_grad", gp, gx)
    run("min_sqdist", min_sqdist)

    # -- fused hypothesis distance, both branches (value + grad) -----------
    def hyp(use_adds):
        b, n, m = 4, 64, 37
        q = random_quaternion(jax.random.key(11), (b, n))
        R = quat_to_matrix(q)
        t = jnp.asarray(rng.uniform(-0.3, 0.3, (b, n, 3)), jnp.float32)
        mdl = jnp.asarray(rng.uniform(-0.05, 0.05, (b, m, 3)), jnp.float32)
        # target = properly-posed model cloud: unstructured random targets
        # produce argmin near-ties whose (sub)gradients legitimately differ
        # between backends — not what this guard is for
        tgt = mdl @ jnp.swapaxes(quat_to_matrix(
            random_quaternion(jax.random.key(3), (b,))), -1, -2) \
            + jnp.asarray(rng.uniform(-0.3, 0.3, (b, 1, 3)), jnp.float32)
        sym = jnp.asarray([True, False, True, False])
        wgt = jnp.asarray(rng.uniform(0.2, 1.0, (b, n)), jnp.float32)

        def total(fused):
            def f(R_, t_):
                d = (hypothesis_mean_dist(R_, t_, mdl, tgt, sym,
                                          use_adds=use_adds,
                                          backend="pallas") if fused else
                     hypothesis_mean_dist_xla(R_, t_, mdl, tgt, sym,
                                              use_adds))
                return jnp.sum(d * wgt)
            return jax.jit(f)(R, t), jax.jit(jax.grad(f, argnums=(0, 1)))(R, t)
        (vp, gp), (vx, gx) = total(True), total(False)
        tag = "adds" if use_adds else "add"
        check(f"hyp_{tag}_val", vp, vx)
        check(f"hyp_{tag}_dR", gp[0], gx[0], tol=2e-2)   # f32 accum order
        check(f"hyp_{tag}_dt", gp[1], gx[1], tol=2e-2)
    run("hyp_add", lambda: hyp(False))
    run("hyp_adds", lambda: hyp(True))

    # -- decoder conv3x3 kernel --------------------------------------------
    def conv():
        xp = jnp.asarray(rng.standard_normal((2, 14, 14, 96)), jnp.float32)
        pk = jnp.asarray(rng.standard_normal((3, 3, 96, 64)) * 0.1,
                         jnp.float32)
        got = conv3x3_valid(xp, pk, backend="pallas")
        want = conv3x3_valid(xp, pk, backend="xla")
        check("conv3x3", got, want)
    run("conv3x3", conv)

    # -- shard_map + Mosaic combined (1-device mesh on the real chip) ------
    def shardmap():
        import jax as _jax
        mesh = Mesh(np.array(_jax.devices()[:1]), ("data",))
        b, n, m = 2, 48, 29
        q = random_quaternion(jax.random.key(5), (b, n))
        R = quat_to_matrix(q)
        t = jnp.asarray(rng.uniform(-0.2, 0.2, (b, n, 3)), jnp.float32)
        mdl = jnp.asarray(rng.uniform(-0.05, 0.05, (b, m, 3)), jnp.float32)
        tgt = jnp.asarray(rng.uniform(-0.05, 0.05, (b, m, 3)), jnp.float32)
        sym = jnp.asarray([True, False])

        def f(R_, t_):
            d = sharded_hypothesis_mean_dist(R_, t_, mdl, tgt, sym, mesh,
                                             backend="pallas")
            return jnp.sum(d)
        v = jax.jit(f)(R, t)
        g = jax.jit(jax.grad(f, argnums=(0, 1)))(R, t)
        want = jnp.sum(hypothesis_mean_dist_xla(R, t, mdl, tgt, sym, True))
        check("shardmap_hyp_val", v, want)
        if not np.all(np.isfinite(_sync(g[0]))):
            fails.append("shardmap_hyp_grad: non-finite")

        qq = jnp.asarray(rng.standard_normal((200, 3)), jnp.float32)
        rr = jnp.asarray(rng.standard_normal((90, 3)), jnp.float32)
        d, i = ring_nearest_neighbor(qq, rr, mesh, backend="pallas")
        dx, ix = nearest_neighbor(qq, rr, backend="xla")
        check("ring_nn_dist", d, dx)
        check("ring_nn_idx", i, ix, exact=True)
    run("shardmap_pallas", shardmap)

    return fails


def train_step_bench(bf16: bool = False, b: int = 32, n: int = 1000,
                     m: int = 500, crop: int = 192, reps: int = 10) -> dict:
    """Device-side model+loss gradient at batch 32 (8/32 symmetric, fused
    ADD/ADD-S hypothesis distance) — the training-path headline. With
    ``bf16=True`` the model computes in bfloat16 (f32 master params/loss),
    the measured recommendation from the round-3 convergence A/B
    (docs/PERF.md): both configs are guarded every round."""
    import jax
    import jax.numpy as jnp
    from densefusion_tpu.models import PoseNet
    from densefusion_tpu.losses.pose_loss import pose_loss

    num_obj = 21
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((b, crop, crop, 3)), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((b, n, 3)) * 0.05, jnp.float32)
    choose = jnp.asarray(rng.integers(0, crop * crop, (b, n)), jnp.int32)
    obj = jnp.asarray(rng.integers(0, num_obj, (b,)), jnp.int32)
    target = jnp.asarray(rng.standard_normal((b, m, 3)) * 0.05, jnp.float32)
    model = jnp.asarray(rng.standard_normal((b, m, 3)) * 0.05, jnp.float32)
    sym = jnp.arange(b) < 8
    w = jnp.float32(0.015)

    posenet = PoseNet(num_obj=num_obj,
                      dtype=jnp.bfloat16 if bf16 else None)
    params = jax.jit(posenet.init)(jax.random.key(0), img, pts, choose, obj)

    def step_loss(p):
        out = posenet.apply(p, img, pts, choose, obj, train=True,
                            rngs={"dropout": jax.random.key(1)})
        return pose_loss(out["pred_r"], out["pred_t"], out["pred_c"],
                         target, model, pts, sym, w, use_adds=True).loss

    g = jax.jit(jax.grad(step_loss))
    out = g(params)
    _sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(params)
    _sync(jax.tree.leaves(out)[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    suffix = "_bf16" if bf16 else ""
    return {f"train_grad_ms_b32{suffix}": round(ms, 2),
            f"train_fps_device{suffix}": round(b / ms * 1e3, 1)}


def refine_step_bench(bf16: bool = False, b: int = 32, n: int = 1000,
                      m: int = 2600, crop: int = 192,
                      reps: int = 10) -> dict:
    """Phase-2 curriculum step at the YCB refine-tail shape (batch 32,
    M=2600 mesh points, 2 refiner iterations, frozen PoseNet): the other
    half of the training story (``tools/train.py:155-159,230-243``),
    measured pipelined like the rest of this harness. Both numerics are
    guarded: the f32 key is the historical driver number; ``bf16=True``
    matches what a ``--bf16`` run actually executes in phase 2 (the r4
    7x-vs-phase-1 reading compared f32 phase-2 against bf16 phase-1 —
    decomposition in examples/tpu_refine_decomp.py + docs/PERF.md r5)."""
    import jax
    import jax.numpy as jnp
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.data import PoseSample
    from densefusion_tpu.train import create_train_state
    from densefusion_tpu.train.steps import make_refine_train_step
    from densefusion_tpu.train.state import make_optimizer
    from densefusion_tpu.utils.config import RunConfig

    num_obj = 21
    rng = np.random.default_rng(0)
    batch = PoseSample(
        points=rng.standard_normal((b, n, 3)).astype(np.float32) * 0.05,
        choose=rng.integers(0, crop * crop, (b, n)).astype(np.int32),
        img=rng.standard_normal((b, crop, crop, 3)).astype(np.float32),
        target=rng.standard_normal((b, m, 3)).astype(np.float32) * 0.05,
        model_points=rng.standard_normal((b, m, 3)).astype(np.float32) * 0.05,
        obj_idx=rng.integers(0, num_obj, (b,)).astype(np.int32),
        sym=(np.arange(b) < 8), valid=np.ones((b,), bool),
    )
    cfg = RunConfig.preset("ycb")
    dtype = jnp.bfloat16 if bf16 else None
    posenet = PoseNet(num_obj=num_obj, dtype=dtype)
    refiner = PoseRefineNet(num_obj=num_obj, dtype=dtype)
    state = create_train_state(posenet, refiner, cfg, jax.random.key(0),
                               batch)
    tx = make_optimizer(cfg.lr)
    state = state.replace(opt_state=tx.init(state.params_refine))
    step = make_refine_train_step(posenet, refiner, tx, refine_iters=2)
    w = np.float32(0.015)
    state, metrics = step(state, batch, w)
    _sync(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = step(state, batch, w)
    _sync(metrics["loss"])
    ms = (time.perf_counter() - t0) / reps * 1e3
    suffix = "_bf16" if bf16 else ""
    return {f"refine_step_ms_b32_M2600{suffix}": round(ms, 2),
            f"refine_fps_device{suffix}": round(b / ms * 1e3, 1)}


def seg_bench() -> dict:
    """Stage-1 (SegNet) numbers in the driver artifact: the 480x640 CE
    train step and the argmax-mask inference pass that produces
    ``segnet_results`` labels — the first stage of the two-stage LineMOD
    protocol becomes regression-visible round-over-round (VERDICT r4
    item 8)."""
    from densefusion_tpu.cli.benchmark import bench_seg

    out = bench_seg(batch=4, repeats=10)
    return {"seg_train_ms_b4": round(out["seg_train_ms_per_step"], 2),
            "seg_infer_fps_b4": round(out["seg_infer_frames_per_s"], 1)}


def loader_bench() -> dict:
    """Host data-plane throughput (fork-worker shared-memory ring, the
    training default): samples/s on the synthetic-YCB pipeline with full
    augmentation — guards the C++ data plane (runtime/dfnative) +
    loader against regression alongside the device numbers."""
    from densefusion_tpu.cli.benchmark import bench_loader

    out = bench_loader(workers=4, batch=16)
    keep = {"loader_warm_samples_per_s", "loader_ring_samples_per_s"}
    return {k: round(v, 1) for k, v in out.items() if k in keep}


def main():
    import jax
    import jax.numpy as jnp

    _ensure_backend()
    from densefusion_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.eval import InferencePipeline

    on_accel = jax.default_backend() != "cpu"
    batch = 64 if on_accel else 4
    n_pts, crop, num_obj, refine_iters = 1000, 192, 21, 2
    dtype = jnp.bfloat16 if on_accel else None

    key = jax.random.key(0)
    imgs = [jax.random.normal(jax.random.key(i), (batch, crop, crop, 3),
                              jnp.float32) for i in range(4)]
    pts = jax.random.normal(key, (batch, n_pts, 3), jnp.float32) * 0.05
    choose = jax.random.randint(key, (batch, n_pts), 0, crop * crop,
                                dtype=jnp.int32)
    obj = jax.random.randint(key, (batch,), 0, num_obj, dtype=jnp.int32)

    posenet = PoseNet(num_obj=num_obj, dtype=dtype)
    refiner = PoseRefineNet(num_obj=num_obj, dtype=dtype)
    pose_params = jax.jit(posenet.init)(key, imgs[0], pts, choose, obj)
    out = jax.jit(posenet.apply)(pose_params, imgs[0], pts, choose, obj)
    refine_params = jax.jit(refiner.init)(key, pts, out["emb"], obj)

    pipe = InferencePipeline(posenet, refiner, refine_iters=refine_iters)

    # warmup / compile
    q, t, c = pipe(pose_params, refine_params, imgs[0], pts, choose, obj)
    np.asarray(q)

    # repeated measurement: the tunnel transport adds round-to-round
    # variance (r4 captured 2483 fps vs r3's 2739 on identical code) — the
    # headline is the MEDIAN of `rounds` independent timed windows and
    # `fps_spread` records min..max so cross-round comparisons carry error
    # bars (VERDICT r4 item 9)
    iters = 20 if on_accel else 5
    rounds = 5 if on_accel else 1
    fps_runs = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = []
        for i in range(iters):
            q, t, c = pipe(pose_params, refine_params, imgs[i % 4], pts,
                           choose, obj)
            outs.append(q)
        # single real sync: device stream is in-order, so transferring the
        # last call's output bounds the completion of every submitted batch
        np.asarray(outs[-1])
        dt = time.perf_counter() - t0
        fps_runs.append(batch * iters / dt)
    fps = float(np.median(fps_runs))

    extras: dict = {}
    if rounds > 1:
        extras["fps_spread"] = [round(min(fps_runs), 1),
                                round(max(fps_runs), 1)]
    if on_accel and os.environ.get("BENCH_FAST") != "1":
        extras.update(train_step_bench())
        extras.update(train_step_bench(bf16=True))
        extras.update(refine_step_bench())
        extras.update(refine_step_bench(bf16=True))
        extras.update(loader_bench())
        extras.update(seg_bench())
        fails = kernel_parity_smokes()
        extras["kernel_parity"] = "ok" if not fails else "FAIL: " + \
            "; ".join(fails)
    else:
        extras["kernel_parity"] = "skipped (cpu)" if not on_accel \
            else "skipped (BENCH_FAST)"

    print(json.dumps({
        "metric": "pose_inference_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        **extras,
    }))
    if on_accel and extras.get("kernel_parity", "ok").startswith("FAIL"):
        sys.exit(1)


if __name__ == "__main__":
    main()
