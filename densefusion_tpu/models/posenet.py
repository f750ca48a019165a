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


class _HeadStack(nn.Module):
    """1408 -> 640 -> 256 -> 128 -> num_obj*out_dim head
    (``lib/network.py:77-91,107-121``)."""

    num_obj: int
    out_dim: int
    dtype: type | None = None
    identity_quat_bias: bool = False

    @nn.compact
    def __call__(self, x):
        d = dict(dtype=self.dtype)
        x = nn.relu(nn.Dense(640, name="fc1", **d)(x))
        x = nn.relu(nn.Dense(256, name="fc2", **d)(x))
        x = nn.relu(nn.Dense(128, name="fc3", **d)(x))

        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            if self.identity_quat_bias:  # start all hypotheses at identity
                b = b.reshape(self.num_obj, 4).at[:, 0].set(1.0).reshape(shape)
            return b

        # small-scale output init: hypotheses start near (identity quat,
        # zero offset) so the initial ADD distance is at object scale,
        # keeping the confidence optimum interior (c* = w/dis)
        x = nn.Dense(self.num_obj * self.out_dim, name="fc4",
                     kernel_init=nn.initializers.variance_scaling(
                         0.01, "fan_in", "truncated_normal"),
                     bias_init=bias_init, **d)(x)
        return x.reshape(x.shape[:-1] + (self.num_obj, self.out_dim))


def select_object(x: jax.Array, obj: jax.Array) -> jax.Array:
    """(B, N, num_obj, D), obj (B,) int -> (B, N, D): per-sample class-slice
    selection (batched ``torch.index_select(rx[b], 0, obj[b])``,
    ``lib/network.py:123-126``)."""
    idx = obj.astype(jnp.int32)[:, None, None, None]
    idx = jnp.broadcast_to(idx, (x.shape[0], x.shape[1], 1, x.shape[3]))
    return jnp.take_along_axis(x, idx, axis=2)[:, :, 0, :]


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

    @nn.compact
    def __call__(self, img, points, choose, obj, train: bool = False):
        cnn = PSPNet(variant=self.cnn_variant, emb_dim=self.emb_dim,
                     dtype=self.dtype, fused_decoder=self.fused_decoder,
                     name="cnn")
        if self.sparse_emb:
            emb = cnn(img, train=train,
                      sample_at=choose.astype(jnp.int32))     # (B, N, d)
        else:
            emb_map = cnn(img, train=train)
            b, h, w, d = emb_map.shape
            flat = emb_map.reshape(b, h * w, d)
            emb = jnp.take_along_axis(
                flat, choose.astype(jnp.int32)[..., None], axis=1)

        feat = DenseFusionFeat(dtype=self.dtype,
                               name="fusion")(points, emb)    # (B, N, 1408)

        rx = _HeadStack(self.num_obj, 4, dtype=self.dtype,
                        identity_quat_bias=True, name="head_r")(feat)
        tx = _HeadStack(self.num_obj, 3, dtype=self.dtype, name="head_t")(feat)
        cx = _HeadStack(self.num_obj, 1, dtype=self.dtype, name="head_c")(feat)

        pred_r = select_object(rx, obj).astype(jnp.float32)
        pred_t = select_object(tx, obj).astype(jnp.float32)
        pred_c_logit = select_object(cx, obj).astype(jnp.float32)[..., 0]
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
