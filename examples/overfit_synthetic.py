"""End-to-end learning check: overfit PoseNet (and then the refiner) on a
tiny synthetic LineMOD-format scene set and report ADD distance + success.

This is the §7.3 'minimum end-to-end slice' as an executable demo: loader ->
PSPNet+fusion PoseNet -> dense hypothesis loss -> curriculum -> eval metric,
with exact synthetic ground truth. Run on CPU or TPU:

    python examples/overfit_synthetic.py --steps 300
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--test_frames", type=int, default=2,
                   help="held-out eval frames (x10 rendered; reader "
                        "subsamples 1/10)")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--crop", type=int, default=96)
    p.add_argument("--points", type=int, default=256)
    p.add_argument("--mesh", type=int, default=256)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--refine_steps", type=int, default=0,
                   help="after pose training, train the refiner this many "
                        "steps and evaluate with 2 refinement iterations")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--objlist", default="1",
                   help="comma-separated LineMOD object ids; include 10 or "
                        "11 (eggbox/glue) to train the symmetric ADD-S "
                        "remap path")
    p.add_argument("--realism", action="store_true",
                   help="domain-randomized scenes (backgrounds, lighting, "
                        "distractors) for generalization instead of overfit")
    p.add_argument("--out", default="")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax

    from densefusion_tpu.data import (
        generate_linemod_style_dataset, LineModDataset, BatchLoader, collate,
    )
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.train import create_train_state
    from densefusion_tpu.train.steps import (
        make_pose_train_step, make_refine_train_step, make_eval_step,
    )
    from densefusion_tpu.train.state import make_optimizer
    from densefusion_tpu.utils.config import RunConfig

    objlist = tuple(int(x) for x in args.objlist.split(","))
    root = tempfile.mkdtemp(prefix="lm_overfit_")
    generate_linemod_style_dataset(root, objlist=objlist,
                                   n_train=args.frames,
                                   n_test=args.test_frames * 10, seed=1,
                                   realism=args.realism)
    ds = LineModDataset(root, mode="train", num_points=args.points,
                        crop_size=args.crop, num_mesh_points=args.mesh,
                        objlist=list(objlist), add_noise=True,
                        noise_trans=0.005)
    test_ds = LineModDataset(root, mode="test", num_points=args.points,
                             crop_size=args.crop, num_mesh_points=args.mesh,
                             objlist=list(objlist), add_noise=False)
    loader = BatchLoader(ds, args.batch, shuffle=True, num_workers=2)
    test_loader = BatchLoader(test_ds, 2, shuffle=False, drop_last=False,
                              num_workers=1)
    # 0.1·diameter success threshold; single-object runs intended (the
    # first object's diameter is used for the success rate)
    diam_threshold = ds.diameters()[0] * 0.1

    cfg = RunConfig(num_objects=len(objlist), num_points=args.points,
                    crop_size=args.crop, lr=args.lr)
    posenet = PoseNet(num_obj=len(objlist))
    refiner = PoseRefineNet(num_obj=len(objlist))
    batch0 = next(iter(loader.epoch(0)))
    state = create_train_state(posenet, refiner, cfg, jax.random.key(0),
                               batch0)
    tx = make_optimizer(args.lr)
    # symmetric objects in the objlist (eggbox/glue) switch the ADD-S remap
    # on — on TPU that trains through the sym-gated Pallas remap kernel
    use_adds = bool(ds.sym_list)
    step_fn = make_pose_train_step(posenet, tx, use_adds=use_adds)
    eval_fn = make_eval_step(posenet, refiner, 0, use_adds=use_adds)
    w = np.float32(0.015)

    t0 = time.time()
    steps_done = 0
    epoch = 0
    history = []
    while steps_done < args.steps:
        for batch in loader.epoch(epoch):
            state, m = step_fn(state, batch, w)
            steps_done += 1
            if steps_done % 25 == 0:
                dis = float(m["dis"])
                history.append(dis)
                print(f"step {steps_done} train_dis {dis:.4f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            if steps_done >= args.steps:
                break
        epoch += 1

    # eval on held-out frames
    def run_eval(fn):
        out = []
        for batch in test_loader.epoch(0):
            d, valid = fn(state.params_pose, state.params_refine, batch, w)
            out += [float(x) for x, v in zip(np.asarray(d), np.asarray(valid))
                    if v]
        return out

    dists = run_eval(eval_fn)

    refine_result = None
    if args.refine_steps:
        refine_step = make_refine_train_step(posenet, refiner, tx,
                                             refine_iters=2)
        state = state.replace(opt_state=tx.init(state.params_refine))
        done = 0
        while done < args.refine_steps:
            for batch in loader.epoch(1_000_000 + epoch):
                state, m = refine_step(state, batch, w)
                done += 1
                if done % 100 == 0:
                    print(f"refine step {done} dis {float(m['dis']):.4f} "
                          f"({time.time() - t0:.0f}s)", flush=True)
                if done >= args.refine_steps:
                    break
            epoch += 1
        refine_eval = make_eval_step(posenet, refiner, 2, use_adds=use_adds)
        rd = run_eval(refine_eval)
        refine_result = {
            "test_dis": rd,
            "test_mean_dis": float(np.mean(rd)),
            "success_rate_0.1d": float(np.mean(
                [d < diam_threshold for d in rd])),
        }

    result = {
        "n_test": len(dists),
        "final_train_dis": history[-1] if history else None,
        "test_dis": dists,
        "test_mean_dis": float(np.mean(dists)),
        "success_rate_0.1d": float(np.mean(
            [d < diam_threshold for d in dists])),
        "diam_threshold": float(diam_threshold),
        "refined": refine_result,
        "seconds": time.time() - t0,
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
