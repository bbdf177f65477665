"""Loss parity vs torch: masked CE (plain + class weights), BCE-with-logits."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from erc_tpu.train.trainer import masked_cross_entropy
from erc_tpu.models.cim import masked_bce_with_logits


def test_masked_ce_matches_flat_torch_ce():
    rng = np.random.default_rng(0)
    B, L, C = 3, 7, 6
    logits = rng.normal(size=(B, L, C)).astype(np.float32)
    labels = rng.integers(0, C, (B, L))
    lengths = [7, 4, 2]
    mask = (np.arange(L)[None] < np.array(lengths)[:, None]).astype(np.float32)

    flat_logits = np.concatenate([logits[i, : lengths[i]] for i in range(B)])
    flat_labels = np.concatenate([labels[i, : lengths[i]] for i in range(B)])
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(flat_logits), torch.from_numpy(flat_labels)
    ).item()
    got = float(masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)))
    assert abs(got - want) < 1e-5


def test_masked_ce_class_weights_match_torch():
    rng = np.random.default_rng(1)
    B, L, C = 2, 6, 6
    logits = rng.normal(size=(B, L, C)).astype(np.float32)
    labels = rng.integers(0, C, (B, L))
    lengths = [6, 3]
    mask = (np.arange(L)[None] < np.array(lengths)[:, None]).astype(np.float32)
    w = rng.uniform(0.5, 2.0, C).astype(np.float32)

    flat_logits = np.concatenate([logits[i, : lengths[i]] for i in range(B)])
    flat_labels = np.concatenate([labels[i, : lengths[i]] for i in range(B)])
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(flat_logits), torch.from_numpy(flat_labels),
        weight=torch.from_numpy(w),
    ).item()
    got = float(
        masked_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), jnp.asarray(w)
        )
    )
    assert abs(got - want) < 1e-5


def test_masked_bce_matches_torch():
    rng = np.random.default_rng(2)
    B, L = 2, 5
    logits = rng.normal(size=(B, L, 7)).astype(np.float32)
    targets = rng.integers(0, 2, (B, L, 7)).astype(np.float32)
    lengths = [5, 2]
    mask = (np.arange(L)[None] < np.array(lengths)[:, None]).astype(np.float32)
    flat_lg = np.concatenate([logits[i, : lengths[i]] for i in range(B)])
    flat_tg = np.concatenate([targets[i, : lengths[i]] for i in range(B)])
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(flat_lg), torch.from_numpy(flat_tg)
    ).item()
    got = float(
        masked_bce_with_logits(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask))
    )
    assert abs(got - want) < 1e-5
