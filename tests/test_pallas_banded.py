"""Banded gather-sum kernel: parity with the jnp reference + gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from erc_tpu.ops.pallas.banded import (
    band_offsets,
    banded_gather_sum,
    banded_gather_sum_reference,
)


@pytest.mark.parametrize("B,L,D,wp,wf", [(2, 32, 16, 5, 5), (1, 17, 8, 10, 10), (3, 64, 128, 2, 0)])
def test_banded_matches_reference(B, L, D, wp, wf):
    offsets = band_offsets(wp, wf)
    rng = np.random.default_rng(0)
    coef = rng.normal(size=(B, L, len(offsets))).astype(np.float32)
    src = rng.normal(size=(B, L, D)).astype(np.float32)
    got = np.asarray(banded_gather_sum(jnp.asarray(coef), jnp.asarray(src), offsets))
    want = np.asarray(
        banded_gather_sum_reference(jnp.asarray(coef), jnp.asarray(src), offsets)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_banded_gradients_match_reference():
    offsets = band_offsets(3, 2)
    rng = np.random.default_rng(1)
    B, L, D = 2, 19, 6
    coef = jnp.asarray(rng.normal(size=(B, L, len(offsets))).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))

    def loss_k(c, s):
        return (banded_gather_sum(c, s, offsets) ** 2).sum()

    def loss_r(c, s):
        return (banded_gather_sum_reference(c, s, offsets) ** 2).sum()

    gk = jax.grad(loss_k, argnums=(0, 1))(coef, src)
    gr = jax.grad(loss_r, argnums=(0, 1))(coef, src)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
