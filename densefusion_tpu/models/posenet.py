"""PoseNet: dense per-pixel fusion + per-point pose hypothesis heads.

Re-design of ``lib/network.py:39-132`` with two TPU-first deltas:

* **True batching** — the reference hardcodes ``b = 0``
  (``lib/network.py:123-126``) making its effective batch size 1; here every
  tensor carries a leading batch dim and per-object head selection is a
  ``take_along_axis`` over the class axis (gradients flow only into the
  selected object's slice, matching ``index_select``).
* **Layout** — point features live in (B, N, C); every 1x1 Conv1d becomes a
  Dense over the channel axis, which XLA maps straight onto the MXU as one
  (B·N, C_in) x (C_in, C_out) matmul.

The per-pixel <-> per-point alignment (``gather`` of CNN embeddings at the
``choose`` indices, ``lib/network.py:98-102``) is a ``take_along_axis`` over
the flattened H·W axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from densefusion_tpu.models.pspnet import PSPNet


class DenseFusionFeat(nn.Module):
    """Per-point dense fusion pyramid (``PoseNetFeat``, ``lib/network.py:39-68``).

    cloud (B, N, 3) + color emb (B, N, emb_dim) ->
    [geo64 | col64] (128) ++ [geo128 | col128] (256) ++ global 1024 = 1408.
    The global feature is an average pool over the point axis, tiled back.
    """

    dtype: type | None = None

    @nn.compact
    def __call__(self, points, emb):
        d = dict(dtype=self.dtype)
        if self.dtype is not None:
            points = points.astype(self.dtype)
            emb = emb.astype(self.dtype)
        g1 = nn.relu(nn.Dense(64, name="geo1", **d)(points))
        c1 = nn.relu(nn.Dense(64, name="col1", **d)(emb))
        feat1 = jnp.concatenate([g1, c1], axis=-1)            # (B, N, 128)

        g2 = nn.relu(nn.Dense(128, name="geo2", **d)(g1))
        c2 = nn.relu(nn.Dense(128, name="col2", **d)(c1))
        feat2 = jnp.concatenate([g2, c2], axis=-1)            # (B, N, 256)

        x = nn.relu(nn.Dense(512, name="mix1", **d)(feat2))
        x = nn.relu(nn.Dense(1024, name="mix2", **d)(x))
        global_feat = jnp.mean(x, axis=-2, keepdims=True)     # (B, 1, 1024)
        global_feat = jnp.broadcast_to(
            global_feat, x.shape[:-1] + (1024,))
        return jnp.concatenate([feat1, feat2, global_feat], axis=-1)  # 1408


_HEAD_WIDTHS = (640, 256, 128)   # lib/network.py:77-91


def _quat_bias_init(num_obj):
    def bias_init(key, shape, dtype=jnp.float32):
        # start all hypotheses at the identity quaternion
        b = jnp.zeros(shape, dtype)
        return b.reshape(num_obj, 4).at[:, 0].set(1.0).reshape(shape)
    return bias_init


class _DenseParams(nn.Module):
    """Bare Dense parameters (same tree as ``nn.Dense``: kernel + bias)."""

    features: int
    kernel_init: object = nn.initializers.lecun_normal()
    bias_init: object = nn.initializers.zeros

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        return kernel, bias


def _declare_head_params(module: nn.Module, in_features: int, num_obj: int,
                         out_dim: int, identity_quat_bias: bool):
    """Declare one head stack's parameters as children fc1..fc4 of
    ``module`` — tree-identical to four named Dense layers, so checkpoints
    and the torch importer see the original per-head structure. Must be
    called from inside ``module``'s compact ``__call__``."""
    layers = []
    d = in_features
    for i, width in enumerate(_HEAD_WIDTHS, start=1):
        layers.append(_DenseParams(width, name=f"fc{i}",
                                   parent=module)(d))
        d = width
    # small-scale output init: hypotheses start near (identity quat,
    # zero offset) so the initial ADD distance is at object scale,
    # keeping the confidence optimum interior (c* = w/dis)
    layers.append(_DenseParams(
        num_obj * out_dim, name="fc4", parent=module,
        kernel_init=nn.initializers.variance_scaling(
            0.01, "fan_in", "truncated_normal"),
        bias_init=(_quat_bias_init(num_obj) if identity_quat_bias
                   else nn.initializers.zeros))(d))
    return layers


class _HeadParams(nn.Module):
    """One head stack's parameter container (children fc1..fc4)."""

    num_obj: int
    out_dim: int
    identity_quat_bias: bool = False

    @nn.compact
    def __call__(self, in_features: int):
        return _declare_head_params(self, in_features, self.num_obj,
                                    self.out_dim, self.identity_quat_bias)


def apply_head_stacks(feat, heads, num_obj, out_dims, dtype=None, obj=None):
    """Run N head stacks over shared input with layer 1 MERGED into one
    matmul: ``feat`` (B, N, F) is the largest activation in the model and
    three separate 1408->640 Dense layers read it three times — one
    (F, 3*640) matmul reads it once (the heads' HBM cost dominates their
    FLOPs; docs/PERF.md round 2). Layers 2-4 stay per-head (small inputs).

    Without ``obj``: returns one (B, N, num_obj, out_dim) per head.
    With ``obj`` (B,) class indices: folds the per-object selection INTO the
    final layer — the fc4 kernel's (in, num_obj, out_dim) slice for each
    sample's class is picked by a one-hot einsum and applied directly,
    returning (B, N, out_dim) per head. Identical values and gradients to
    computing all classes then selecting (the one-hot contraction routes
    gradient only into the selected class slice, = ``index_select``), but
    1/num_obj the fc4 FLOPs and — the real win — no per-element gather:
    ``take_along_axis`` over the class axis measured 7.4 ms/batch-64 on TPU
    vs ~0 for the einsum formulation (docs/PERF.md round 2).
    """
    cast = (lambda a: a.astype(dtype)) if dtype is not None else (lambda a: a)
    k1 = jnp.concatenate([cast(h[0][0]) for h in heads], axis=1)
    b1 = jnp.concatenate([cast(h[0][1]) for h in heads])
    y = nn.relu(cast(feat) @ k1 + b1)                  # (B, N, 3*640)

    onehot = None
    if obj is not None:
        onehot = jax.nn.one_hot(obj, num_obj, dtype=y.dtype)     # (B, O)

    outs = []
    width = _HEAD_WIDTHS[0]
    for idx, (head, out_dim) in enumerate(zip(heads, out_dims)):
        x = y[..., idx * width:(idx + 1) * width]
        for k, b in head[1:-1]:
            x = nn.relu(x @ cast(k) + cast(b))
        k, b = head[-1]
        if onehot is None:
            x = x @ cast(k) + cast(b)
            outs.append(x.reshape(x.shape[:-1] + (num_obj, out_dim)))
        else:
            kk = cast(k).reshape(-1, num_obj, out_dim)
            ksel = jnp.einsum("koe,bo->bke", kk, onehot)         # (B, in, e)
            bsel = jnp.einsum("oe,bo->be",
                              cast(b).reshape(num_obj, out_dim), onehot)
            outs.append(jnp.einsum("bnk,bke->bne", x, ksel)
                        + bsel[:, None, :])
    return outs


class _HeadStack(nn.Module):
    """Single 1408 -> 640 -> 256 -> 128 -> num_obj*out_dim head
    (``lib/network.py:77-91,107-121``) — the unmerged reference formulation,
    kept for equivalence tests against :func:`apply_head_stacks`."""

    num_obj: int
    out_dim: int
    dtype: type | None = None
    identity_quat_bias: bool = False

    @nn.compact
    def __call__(self, x):
        params = _declare_head_params(self, x.shape[-1], self.num_obj,
                                      self.out_dim, self.identity_quat_bias)
        cast = (lambda a: a.astype(self.dtype)) if self.dtype is not None \
            else (lambda a: a)
        x = cast(x)
        for k, b in params[:-1]:
            x = nn.relu(x @ cast(k) + cast(b))
        k, b = params[-1]
        x = x @ cast(k) + cast(b)
        return x.reshape(x.shape[:-1] + (self.num_obj, self.out_dim))


def select_object(x: jax.Array, obj: jax.Array) -> jax.Array:
    """(B, N, num_obj, D), obj (B,) int -> (B, N, D): per-sample class-slice
    selection (batched ``torch.index_select(rx[b], 0, obj[b])``,
    ``lib/network.py:123-126``).

    One-hot contraction, not ``take_along_axis``: the per-element gather
    lowers to a scalar loop on TPU (7.4 ms/batch-64 across the three heads)
    while the einsum is a trivial VPU reduce (docs/PERF.md round 2). Values
    and gradients are identical for in-range ``obj``.
    """
    onehot = jax.nn.one_hot(obj, x.shape[2], dtype=x.dtype)
    return jnp.einsum("bnod,bo->bnd", x, onehot)


class PoseNet(nn.Module):
    """Main estimator: (img, points, choose, obj) -> per-point pose hypotheses.

    Args (all batched):
      img:    (B, H, W, 3) normalized crop (H, W multiples of 8).
      points: (B, N, 3) back-projected cloud, meters.
      choose: (B, N) int32 flat pixel indices into the crop's H·W.
      obj:    (B,) int32 class index.

    Returns dict:
      pred_r: (B, N, 4) unnormalized quaternions (wxyz).
      pred_t: (B, N, 3) translation OFFSETS from each observed point
              (``lib/loss.py:38``: t_i = points_i + pred_t_i).
      pred_c: (B, N) confidence in (0, 1).
      emb:    (B, N, emb_dim) color embeddings, stop-gradiented — the refiner
              consumes them frozen (``lib/network.py:132``).
    """

    num_obj: int
    cnn_variant: str = "resnet18"
    emb_dim: int = 32
    dtype: type | None = None    # bf16 compute path: set jnp.bfloat16
    sparse_emb: bool = True      # sparse-decode the CNN at the N choose
    # pixels instead of the full crop (identical math; docs/PERF.md)
    fused_decoder: bool = True   # phase-conv upsample stages (docs/PERF.md)
    # reference-exact decoder resizes (nn.Upsample align_corners=True +
    # zero conv padding) for imported torch weights; overrides fused_decoder
    align_corners: bool = False
    # rematerialize the CNN in backward: trades ~one extra CNN forward for
    # not keeping its trunk/decoder activations live through the fusion/
    # loss — the dominant activation term at large batch (crop² · channels).
    # Identical math and parameter tree; only the autodiff schedule changes.
    remat_cnn: bool = False

    @nn.compact
    def __call__(self, img, points, choose, obj, train: bool = False):
        cnn = PSPNet(variant=self.cnn_variant, emb_dim=self.emb_dim,
                     dtype=self.dtype, fused_decoder=self.fused_decoder,
                     align_corners=self.align_corners, name="cnn")
        sample_at = choose.astype(jnp.int32) if self.sparse_emb else None

        def run_cnn(mdl, img_, sample_at_):
            return mdl(img_, train=train, sample_at=sample_at_)

        if self.remat_cnn:
            run_cnn = nn.remat(run_cnn)
        if self.sparse_emb:
            emb = run_cnn(cnn, img, sample_at)                # (B, N, d)
        else:
            emb_map = run_cnn(cnn, img, None)
            b, h, w, d = emb_map.shape
            flat = emb_map.reshape(b, h * w, d)
            emb = jnp.take_along_axis(
                flat, choose.astype(jnp.int32)[..., None], axis=1)

        feat = DenseFusionFeat(dtype=self.dtype,
                               name="fusion")(points, emb)    # (B, N, 1408)

        f = feat.shape[-1]
        heads = [
            _HeadParams(self.num_obj, 4, identity_quat_bias=True,
                        name="head_r")(f),
            _HeadParams(self.num_obj, 3, name="head_t")(f),
            _HeadParams(self.num_obj, 1, name="head_c")(f),
        ]
        rx, tx, cx = apply_head_stacks(feat, heads, self.num_obj, (4, 3, 1),
                                       dtype=self.dtype, obj=obj)

        pred_r = rx.astype(jnp.float32)
        pred_t = tx.astype(jnp.float32)
        pred_c_logit = cx.astype(jnp.float32)[..., 0]
        return {
            "pred_r": pred_r,
            "pred_t": pred_t,
            "pred_c": jax.nn.sigmoid(pred_c_logit),
            # raw logit: lets the loss use log_sigmoid for a confidence
            # barrier whose gradient never saturates (lib/loss.py:50 computes
            # log(sigmoid(z)) through the probability, which underflows)
            "pred_c_logit": pred_c_logit,
            "emb": jax.lax.stop_gradient(emb),
        }
