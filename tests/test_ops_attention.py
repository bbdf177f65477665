"""Golden tests: masked attention + transformer encoder vs torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from erc_tpu.ops.attention import (
    MultiheadAttention,
    TransformerEncoderLayer,
    masked_softmax,
)


def test_masked_softmax_modes():
    scores = jnp.asarray([[1.0, 2.0, 3.0]])
    mask = jnp.asarray([[1.0, 0.0, 1.0]])
    for mode in ("subtract", "where"):
        out = np.asarray(masked_softmax(scores, mask, mode=mode))
        assert out[0, 1] < 1e-6
        np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-5)
    # empty row: 'where' yields zeros
    out = np.asarray(masked_softmax(scores, jnp.zeros((1, 3)), mode="where"))
    np.testing.assert_allclose(out, 0.0)


def test_mha_matches_torch():
    torch.manual_seed(0)
    B, L, E, H = 2, 7, 16, 4
    tmod = torch.nn.MultiheadAttention(E, H, batch_first=True)
    x = np.random.default_rng(0).normal(size=(B, L, E)).astype(np.float32)
    lengths = [7, 4]
    kpm = torch.zeros(B, L, dtype=torch.bool)
    for i, ln in enumerate(lengths):
        kpm[i, ln:] = True  # torch: True = IGNORE
    with torch.no_grad():
        want, _ = tmod(*(torch.from_numpy(x),) * 3, key_padding_mask=kpm)
    want = want.numpy()

    mod = MultiheadAttention(E, H)
    params = {
        "in_proj_weight": jnp.asarray(tmod.in_proj_weight.detach().numpy()),
        "in_proj_bias": jnp.asarray(tmod.in_proj_bias.detach().numpy()),
        "out_proj_weight": jnp.asarray(tmod.out_proj.weight.detach().numpy()),
        "out_proj_bias": jnp.asarray(tmod.out_proj.bias.detach().numpy()),
    }
    mask = (np.arange(L)[None] < np.array(lengths)[:, None]).astype(np.float32)
    got = np.asarray(
        mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), jnp.asarray(mask))
    )
    for i, ln in enumerate(lengths):
        np.testing.assert_allclose(got[i, :ln], want[i, :ln], rtol=1e-4, atol=1e-5)


def test_encoder_layer_matches_torch():
    torch.manual_seed(0)
    B, L, E, H = 2, 5, 12, 3
    tmod = torch.nn.TransformerEncoderLayer(
        d_model=E, nhead=H, dropout=0.0, batch_first=True
    ).eval()
    x = np.random.default_rng(3).normal(size=(B, L, E)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()

    mod = TransformerEncoderLayer(E, H, dim_feedforward=2048, dropout=0.0)
    sd = tmod.state_dict()
    params = {
        "MultiheadAttention_0": {
            "in_proj_weight": jnp.asarray(sd["self_attn.in_proj_weight"].numpy()),
            "in_proj_bias": jnp.asarray(sd["self_attn.in_proj_bias"].numpy()),
            "out_proj_weight": jnp.asarray(sd["self_attn.out_proj.weight"].numpy()),
            "out_proj_bias": jnp.asarray(sd["self_attn.out_proj.bias"].numpy()),
        },
        "LayerNorm_0": {
            "scale": jnp.asarray(sd["norm1.weight"].numpy()),
            "bias": jnp.asarray(sd["norm1.bias"].numpy()),
        },
        "LayerNorm_1": {
            "scale": jnp.asarray(sd["norm2.weight"].numpy()),
            "bias": jnp.asarray(sd["norm2.bias"].numpy()),
        },
        "Dense_0": {
            "kernel": jnp.asarray(sd["linear1.weight"].numpy().T),
            "bias": jnp.asarray(sd["linear1.bias"].numpy()),
        },
        "Dense_1": {
            "kernel": jnp.asarray(sd["linear2.weight"].numpy().T),
            "bias": jnp.asarray(sd["linear2.bias"].numpy()),
        },
    }
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
