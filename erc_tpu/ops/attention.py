"""Masked attention ops + torch-style transformer encoder.

Replaces the reference's vendored ``contrib/nn.py`` MultiheadAttention /
TransformerEncoderLayer (contrib/nn.py:24,206) used by COGMEN.  Post-LN
("norm after") residual structure, relu FF, matching torch defaults so
golden tests against torch validate the math.  Dense masked softmax is the
one workhorse shared by every model family (CIM attention_op cim.py:108-115,
DAG-ERC mask_logic dagerc_models.py:83-90, dgcnv2 MaskedEdgeAttention).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e30


def masked_softmax(scores, mask, axis: int = -1, mode: str = "subtract"):
    """Softmax with invalid positions masked out.

    mode='subtract' reproduces the reference's ``alpha - (1-adj)*1e30``
    (dagerc_models.py:83-90); mode='where' is the numerically safer
    variant used for new code.  Rows with no valid entries return zeros.
    """
    if mode == "subtract":
        scores = scores + (1.0 - mask) * NEG_INF
        out = jax.nn.softmax(scores, axis=axis)
        return out
    big_neg = jnp.finfo(scores.dtype).min / 2
    masked = jnp.where(mask > 0, scores, big_neg)
    out = jax.nn.softmax(masked, axis=axis)
    any_valid = jnp.sum(mask, axis=axis, keepdims=True) > 0
    return jnp.where(any_valid, out * (mask > 0), 0.0)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (packed in_proj, out_proj)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, deterministic: bool = True):
        E, H = self.embed_dim, self.num_heads
        Dh = E // H
        # torch packs q/k/v projections into one [3E, E] matrix, xavier-uniform
        in_proj_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * E, E))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        wq, wk, wv = jnp.split(in_proj_w, 3, 0)
        bq, bk, bv = jnp.split(in_proj_b, 3, 0)
        out_w = self.param("out_proj_weight", nn.initializers.xavier_uniform(), (E, E))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (E,))

        B, Lq, _ = q.shape
        Lk = k.shape[1]

        def heads(x, w, b, L):
            return (x @ w.T + b).reshape(B, L, H, Dh).transpose(0, 2, 1, 3)

        qh = heads(q, wq, bq, Lq) / jnp.sqrt(Dh).astype(q.dtype)
        kh = heads(k, wk, bk, Lk)
        vh = heads(v, wv, bv, Lk)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
        if key_padding_mask is not None:
            # key_padding_mask: [B, Lk], 1 = valid
            scores = jnp.where(
                key_padding_mask[:, None, None, :] > 0, scores, NEG_INF
            )
        attn = jax.nn.softmax(scores, -1)
        if self.dropout > 0 and not deterministic:
            attn = nn.Dropout(self.dropout)(attn, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        return out @ out_w.T + out_b


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer, torch defaults (contrib/nn.py:206-289)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        drop = lambda t: (
            nn.Dropout(self.dropout)(t, deterministic=False)
            if (self.dropout > 0 and not deterministic)
            else t
        )
        sa = MultiheadAttention(self.d_model, self.nhead, self.dropout)(
            x, x, x, key_padding_mask, deterministic
        )
        x = nn.LayerNorm(epsilon=1e-5)(x + drop(sa))
        ff = nn.Dense(self.dim_feedforward)(x)
        ff = drop(nn.relu(ff))
        ff = nn.Dense(self.d_model)(ff)
        x = nn.LayerNorm(epsilon=1e-5)(x + drop(ff))
        return x


class TransformerEncoder(nn.Module):
    """Stack of encoder layers (reference: nn.TransformerEncoder, 2 layers)."""

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        for _ in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout
            )(x, key_padding_mask, deterministic)
        return x
