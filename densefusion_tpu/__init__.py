"""densefusion_tpu — a TPU-native 6D object pose estimation framework.

Built from scratch in JAX/XLA/Pallas with the full capabilities of the
DenseFusion reference (adamchang2000/DenseFusion): semantic segmentation
(SegNet), per-pixel PSPNet color embeddings densely fused with PointNet-style
cloud features, per-point pose hypothesis regression with confidence
self-calibration, ADD/ADD-S losses backed by a tiled Pallas 1-NN kernel, and
iterative pose refinement as an on-device `lax.scan`.

Subpackages
-----------
geometry   quaternion / rotation math, camera back-projection, bbox ladder
ops        Pallas + XLA kernels (tiled KNN, fused point ops)
models     PSPNet trunk, PoseNet, PoseRefineNet, SegNet (flax.linen)
losses     dense ADD(-S) pose loss, refiner loss, segmentation CE
data       dataset loaders (YCB / LineMOD / customCAD), augmentation, prefetch
train      jitted train step, two-phase curriculum, checkpointing
eval       metrics (ADD, ADD-S, VOCap AUC, <2cm), eval pipelines
parallel   device mesh, shardings, collectives (grad psum, sharded KNN)
utils      configs, logging, profiling
"""

__version__ = "0.1.0"
