"""Semantic-segmentation cross-entropy loss.

Re-design of ``vanilla_segmentation/loss.py:13-30``: per-pixel softmax
cross-entropy over the class axis, averaged over all pixels. Accepts an
optional per-pixel weight/ignore mask (capability extension; the reference
averages every pixel)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segmentation_loss(logits: jax.Array, labels: jax.Array,
                      weights: jax.Array | None = None) -> jax.Array:
    """logits (B, H, W, C), labels (B, H, W) int -> scalar mean CE."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(
        log_probs, labels.astype(jnp.int32)[..., None], axis=-1)[..., 0]
    if weights is None:
        return -jnp.mean(ll)
    w = weights.astype(ll.dtype)
    return -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
