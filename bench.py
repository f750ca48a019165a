"""End-to-end benchmark: pose inference throughput on the flagship pipeline.

Measures frames/s of the full jitted estimate + 2-iteration-refine program
(YCB configuration: 21 objects, 1000-point clouds, 192px crops, bf16 MXU
compute) on the available accelerator, and compares against the reference's
published inference speed of ~0.06 s/frame (= 16.7 fps) for PoseNet +
refinement on a GPU (DenseFusion paper, BASELINE.md).

Methodology: requests are submitted pipelined (multiple batches in flight,
one device sync at the end) — the serving pattern — so a tunnel/dispatch RTT
is amortized rather than multiplied; the sync is a real host transfer of the
final output because `block_until_ready` can be a no-op on experimental
TPU-tunnel platforms.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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


def main():
    import jax
    import jax.numpy as jnp

    _ensure_backend()
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

    iters = 20 if on_accel else 5
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        q, t, c = pipe(pose_params, refine_params, imgs[i % 4], pts, choose,
                       obj)
        outs.append(q)
    # single real sync: device stream is in-order, so transferring the last
    # call's output bounds the completion of every submitted batch
    np.asarray(outs[-1])
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "pose_inference_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
