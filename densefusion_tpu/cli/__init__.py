"""Command-line entry points (the L5 driver layer of SURVEY.md §1):

* ``python -m densefusion_tpu.cli.train`` — two-phase pose training
  (``tools/train.py`` equivalent).
* ``python -m densefusion_tpu.cli.eval_linemod`` — LineMOD ADD(-S) < 0.1d
  success rates (``tools/eval_linemod.py``).
* ``python -m densefusion_tpu.cli.eval_ycb`` — YCB keyframe eval with
  PoseCNN segmentation + in-repo AUC/<2cm metrics (``tools/eval_ycb.py`` +
  the MATLAB toolbox).
* ``python -m densefusion_tpu.cli.eval_cad`` — customCAD eval with PLY dumps
  (``tools/eval_cad.py``).
* ``python -m densefusion_tpu.cli.train_seg`` — SegNet segmentation training
  (``vanilla_segmentation/train.py``).
* ``python -m densefusion_tpu.cli.benchmark`` — kernel + end-to-end perf.
"""
