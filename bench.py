"""End-to-end benchmark: pose inference throughput on the flagship pipeline.

Measures frames/s of the full jitted estimate + 2-iteration-refine program
(YCB configuration: 21 objects, 1000-point clouds, 192px crops) on the
available accelerator, and compares against the reference's published
inference speed of ~0.06 s/frame (= 16.7 fps) for PoseNet + refinement on a
GPU (DenseFusion paper, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_FPS = 1.0 / 0.06  # reference: ~0.06 s/frame pose+refine (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.eval import InferencePipeline

    batch, n_pts, crop, num_obj, refine_iters = 16, 1000, 192, 21, 2

    key = jax.random.key(0)
    img = jax.random.normal(key, (batch, crop, crop, 3), jnp.float32)
    pts = jax.random.normal(key, (batch, n_pts, 3), jnp.float32) * 0.05
    choose = jax.random.randint(key, (batch, n_pts), 0, crop * crop,
                                dtype=jnp.int32)
    obj = jax.random.randint(key, (batch,), 0, num_obj, dtype=jnp.int32)

    posenet = PoseNet(num_obj=num_obj)
    refiner = PoseRefineNet(num_obj=num_obj)
    pose_params = posenet.init(key, img, pts, choose, obj)
    out = posenet.apply(pose_params, img, pts, choose, obj)
    refine_params = refiner.init(key, pts, out["emb"], obj)

    pipe = InferencePipeline(posenet, refiner, refine_iters=refine_iters)

    # warmup/compile (np.asarray forces the full round-trip — on some
    # experimental TPU-tunnel platforms block_until_ready is a no-op, so
    # timing must gate on a real host transfer of a small output)
    q, t, c = pipe(pose_params, refine_params, img, pts, choose, obj)
    np.asarray(q)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        q, t, c = pipe(pose_params, refine_params, img, pts, choose, obj)
        np.asarray(q)  # (B, 4) transfer: negligible bytes, real sync
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
