"""Segmentation inference CLI: run a trained SegNet over frames and write
label PNGs.

Fills the pipeline role of the reference's precomputed ``segnet_results/``
masks (consumed by LineMOD 'eval' mode, ``datasets/linemod/dataset.py:57-58``):
with ``--binary_class`` the output is a 255/0 mask for one class in the
``{frame:04d}_label.png`` naming that ``LineModDataset(mode='eval')`` reads;
otherwise the argmax label map is written (YCB-style).

Example::

    python -m densefusion_tpu.cli.segment \
        --checkpoint trained_models/segnet/segnet_best.msgpack \
        --images '/data/lm/data/01/rgb/*.png' \
        --out_dir /data/lm/segnet_results/01_label --binary_class 1
"""

from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="segnet_best.msgpack from cli.train_seg")
    p.add_argument("--images", required=True,
                   help="glob of input RGB frames")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--num_classes", type=int, default=22)
    p.add_argument("--binary_class", type=int, default=None,
                   help="write a 255/0 mask for this class id instead of the "
                        "full label map")
    p.add_argument("--class_vs_bg", action="store_true",
                   help="with --binary_class: mask where the class's logit "
                        "beats BACKGROUND's (instead of the full argmax) — "
                        "the right query when the sequence's object identity "
                        "is known a priori, as in the LineMOD eval protocol "
                        "(one object per test sequence, "
                        "tools/eval_linemod.py:64): pixels contested only "
                        "between 'this object' and 'not an object' don't "
                        "forfeit to a third class's logit")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--list", dest="list_file", default=None,
                   help="text file of frame ids; only globbed images whose "
                        "basename stem matches an id (as-is or %%04d) are "
                        "segmented")
    args = p.parse_args(argv)
    if args.class_vs_bg and args.binary_class is None:
        p.error("--class_vs_bg requires --binary_class (it selects WHICH "
                "class's logit is compared against background)")
    from densefusion_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    import numpy as np
    import jax
    from flax import serialization
    from PIL import Image

    from densefusion_tpu.models import SegNet
    from densefusion_tpu.data.schema import normalize_image

    paths = sorted(glob.glob(args.images))
    if args.list_file:
        with open(args.list_file) as f:
            ids = {ln.strip() for ln in f if ln.strip()}
        ids |= {f"{int(i):04d}" for i in ids if i.isdigit()}
        paths = [p_ for p_ in paths
                 if os.path.splitext(os.path.basename(p_))[0] in ids]
    if not paths:
        raise SystemExit(f"no images match {args.images!r}")
    os.makedirs(args.out_dir, exist_ok=True)

    segnet = SegNet(num_classes=args.num_classes)
    first = normalize_image(np.array(Image.open(paths[0]))[..., :3])
    # jitted init: un-jitted flax init dispatches one device op per
    # parameter — ~1 min of RTTs on remote-tunnel backends
    variables = jax.jit(
        lambda: segnet.init(jax.random.key(0), first[None], train=False))()
    with open(args.checkpoint, "rb") as f:
        variables = serialization.from_bytes(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}, f.read())

    @jax.jit
    def predict(rgb):
        logits = segnet.apply(variables, rgb, train=False)
        if args.class_vs_bg and args.binary_class is not None:
            # 255 where p(class) > p(background); other classes don't vote
            return (logits[..., args.binary_class] > logits[..., 0])
        return jax.numpy.argmax(logits, axis=-1)

    for i in range(0, len(paths), args.batch_size):
        chunk = paths[i:i + args.batch_size]
        rgb = np.stack([
            normalize_image(np.array(Image.open(p_))[..., :3])
            for p_ in chunk])
        labels = np.asarray(predict(rgb))
        for p_, lab in zip(chunk, labels):
            stem = os.path.splitext(os.path.basename(p_))[0]
            if args.binary_class is not None:
                hit = lab if lab.dtype == bool else (lab == args.binary_class)
                out = (hit * 255).astype(np.uint8)
            else:
                out = lab.astype(np.uint8)
            Image.fromarray(out).save(
                os.path.join(args.out_dir, f"{stem}_label.png"))
    print(f"wrote {len(paths)} label maps to {args.out_dir}")


if __name__ == "__main__":
    main()
