"""Trainer unit edge cases: empty masks, metric aggregation, stacking."""

import numpy as np

import jax.numpy as jnp

from erc_tpu.train.trainer import (
    _stack_batches,
    masked_accuracy,
    masked_cross_entropy,
)


def test_masked_ce_empty_mask_is_finite():
    logits = jnp.zeros((2, 3, 4))
    labels = jnp.full((2, 3), -1)
    mask = jnp.zeros((2, 3))
    assert np.isfinite(float(masked_cross_entropy(logits, labels, mask)))
    assert np.isfinite(float(masked_accuracy(logits, labels, mask)))


def test_masked_accuracy_values():
    logits = jnp.asarray([[[0.0, 1.0], [1.0, 0.0], [9.0, 0.0]]])
    labels = jnp.asarray([[1, 0, 1]])
    mask = jnp.asarray([[1.0, 1.0, 0.0]])  # third position padded
    assert float(masked_accuracy(logits, labels, mask)) == 1.0


def test_stack_batches_none_passthrough():
    b = {"x": np.ones((2, 3)), "y": None}
    s = _stack_batches([b, b])
    assert s["x"].shape == (2, 2, 3)
    assert s["y"] is None
