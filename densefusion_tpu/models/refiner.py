"""PoseRefineNet: residual pose regression over the canonicalized cloud.

Re-design of ``lib/network.py:136-206``, batched (the reference's ``b = 0``
selection is replaced by a batched ``take_along_axis``). The refiner sees the
observed cloud re-expressed in the current pose estimate's frame plus the
FROZEN color embeddings, and predicts a residual (quaternion, translation)
composed onto the running pose — the composition itself lives in
``densefusion_tpu.eval.pipeline`` as a ``lax.scan``.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from densefusion_tpu.models.posenet import select_object


class RefineFeat(nn.Module):
    """Global 1024-d fusion feature (``PoseRefineNetFeat``,
    ``lib/network.py:136-168``): per-level concat like DenseFusionFeat but the
    two levels are themselves concatenated (128 + 256 = 384) before the
    512/1024 mix, and only the pooled global vector is returned."""

    dtype: type | None = None

    @nn.compact
    def __call__(self, points, emb):
        d = dict(dtype=self.dtype)
        if self.dtype is not None:
            points = points.astype(self.dtype)
            emb = emb.astype(self.dtype)
        g1 = nn.relu(nn.Dense(64, name="geo1", **d)(points))
        c1 = nn.relu(nn.Dense(64, name="col1", **d)(emb))
        feat1 = jnp.concatenate([g1, c1], axis=-1)             # (B, N, 128)

        g2 = nn.relu(nn.Dense(128, name="geo2", **d)(g1))
        c2 = nn.relu(nn.Dense(128, name="col2", **d)(c1))
        feat2 = jnp.concatenate([g2, c2], axis=-1)             # (B, N, 256)

        x = jnp.concatenate([feat1, feat2], axis=-1)           # (B, N, 384)
        x = nn.relu(nn.Dense(512, name="mix1", **d)(x))
        x = nn.relu(nn.Dense(1024, name="mix2", **d)(x))
        return jnp.mean(x, axis=-2)                            # (B, 1024)


class PoseRefineNet(nn.Module):
    """(points (B,N,3) canonicalized, emb (B,N,emb_dim) frozen, obj (B,)) ->
    residual pose: quat (B, 4) unnormalized wxyz, translation (B, 3).

    Heads: two Linear stacks 1024 -> 512 -> 128 -> num_obj*{4,3}
    (``lib/network.py:176-206``).
    """

    num_obj: int
    dtype: type | None = None

    @nn.compact
    def __call__(self, points, emb, obj):
        feat = RefineFeat(dtype=self.dtype,
                          name="fusion")(points, emb)          # (B, 1024)

        def head(out_dim, name, bias_init=nn.initializers.zeros):
            d = dict(dtype=self.dtype)
            x = nn.relu(nn.Dense(512, name=f"{name}_fc1", **d)(feat))
            x = nn.relu(nn.Dense(128, name=f"{name}_fc2", **d)(x))
            # small-scale output init: residual poses start near identity
            x = nn.Dense(self.num_obj * out_dim, name=f"{name}_fc3",
                         kernel_init=nn.initializers.variance_scaling(
                             0.01, "fan_in", "truncated_normal"),
                         bias_init=bias_init, **d)(x)
            x = x.astype(jnp.float32)
            x = x.reshape(x.shape[0], 1, self.num_obj, out_dim)
            return select_object(x, obj)[:, 0, :]              # (B, out_dim)

        def identity_quat_bias(key, shape, dtype=jnp.float32):
            # residual rotations start AT the identity quaternion, not at a
            # random direction from normalizing near-zero noise
            b = jnp.zeros(shape, dtype).reshape(self.num_obj, 4)
            return b.at[:, 0].set(1.0).reshape(shape)

        return {"pred_r": head(4, "head_r", identity_quat_bias),
                "pred_t": head(3, "head_t")}
