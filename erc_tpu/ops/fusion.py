"""Attention/fusion modules from the MMGCN family
(reference: track_mm/mmgcn_models.py:42-161,164-179).

MatchingAttention (dot/general/general2/concat), SimpleAttention, and the
MMGatedAttention tri-modal gated fusion.  MMGCN constructs these but its
executed forward path doesn't call them (mmgcn.py:92 vs :96-122); they are
part of the public capability surface (dgcnv2's nodal attention uses the
general2 variant) so they live here as first-class batched ops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class SimpleAttention(nn.Module):
    """scalar-scored attention over memory [B, L, D] (mmgcn_models.py:164-179)."""

    @nn.compact
    def __call__(self, M, mask: Optional[jnp.ndarray] = None):
        scale = nn.Dense(1, use_bias=False, name="scalar")(M)[..., 0]  # [B, L]
        if mask is not None:
            big_neg = jnp.finfo(scale.dtype).min / 2
            scale = jnp.where(mask > 0, scale, big_neg)
        alpha = jax.nn.softmax(scale, -1)
        pooled = jnp.einsum("bl,bld->bd", alpha, M)
        return pooled, alpha


class MatchingAttention(nn.Module):
    """Query-conditioned pooling over memory (mmgcn_models.py:42-95).

    att_type: 'dot' | 'general' | 'general2' | 'concat'.
    M: [B, L, D_mem]; x: [B, D_cand]; mask: [B, L].
    """

    mem_dim: int
    cand_dim: int
    alpha_dim: Optional[int] = None
    att_type: str = "general"

    @nn.compact
    def __call__(self, M, x, mask: Optional[jnp.ndarray] = None):
        if mask is None:
            mask = jnp.ones(M.shape[:2], M.dtype)
        if self.att_type == "dot":
            alpha = jax.nn.softmax(jnp.einsum("bd,bld->bl", x, M), -1)
        elif self.att_type == "general":
            xq = nn.Dense(self.mem_dim, use_bias=False, name="transform")(x)
            alpha = jax.nn.softmax(jnp.einsum("bd,bld->bl", xq, M), -1)
        elif self.att_type == "general2":
            xq = nn.Dense(self.mem_dim, use_bias=True, name="transform")(x)
            Mm = M * mask[..., None]
            a = jnp.tanh(jnp.einsum("bd,bld->bl", xq, Mm) * mask)
            a = jax.nn.softmax(a, -1) * mask
            alpha = a / jnp.maximum(a.sum(-1, keepdims=True), 1e-10)
        elif self.att_type == "concat":
            L = M.shape[1]
            xx = jnp.repeat(x[:, None, :], L, 1)
            mx = jnp.tanh(
                nn.Dense(self.alpha_dim or self.mem_dim, use_bias=False, name="transform")(
                    jnp.concatenate([M, xx], -1)
                )
            )
            alpha = jax.nn.softmax(
                nn.Dense(1, use_bias=False, name="vector_prod")(mx)[..., 0], -1
            )
        else:
            raise ValueError(self.att_type)
        pooled = jnp.einsum("bl,bld->bd", alpha, M)
        return pooled, alpha


class MMGatedAttention(nn.Module):
    """Tri-modal gated fusion (mmgcn_models.py:98-161, att_type='general')."""

    mem_dim: int
    cand_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, a, v, l, modals: str = "atv", deterministic: bool = True):
        def drop(t, name):
            if not deterministic and self.dropout > 0:
                return nn.Dropout(self.dropout)(t, deterministic=False)
            return t

        a = drop(a, "a") if a is not None else a
        v = drop(v, "v") if v is not None else v
        l = drop(l, "l") if l is not None else l

        ha = jnp.tanh(nn.Dense(self.cand_dim, name="transform_a")(a)) if "a" in modals else a
        hv = jnp.tanh(nn.Dense(self.cand_dim, name="transform_v")(v)) if "v" in modals else v
        hl = jnp.tanh(nn.Dense(self.cand_dim, name="transform_l")(l)) if "t" in modals else l

        outs = []
        if "a" in modals and "v" in modals:
            z = jax.nn.sigmoid(
                nn.Dense(1, name="transform_av")(jnp.concatenate([a, v, a * v], -1))
            )
            h_av = z * ha + (1 - z) * hv
            if "t" not in modals:
                return h_av
            outs.append(h_av)
        if "a" in modals and "t" in modals:
            z = jax.nn.sigmoid(
                nn.Dense(1, name="transform_al")(jnp.concatenate([a, l, a * l], -1))
            )
            h_al = z * ha + (1 - z) * hl
            if "v" not in modals:
                return h_al
            outs.append(h_al)
        if "v" in modals and "t" in modals:
            z = jax.nn.sigmoid(
                nn.Dense(1, name="transform_vl")(jnp.concatenate([v, l, v * l], -1))
            )
            h_vl = z * hv + (1 - z) * hl
            if "a" not in modals:
                return h_vl
            outs.append(h_vl)
        return jnp.concatenate(outs, -1)
