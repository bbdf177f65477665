"""Banded gather-sum Pallas kernel — the windowed message-passing hot op.

Every windowed graph in the model zoo (COGMEN wp=wf=5, DialogueGCN
wp=wf=10) has edges only within a K-wide diagonal band, K = wp+wf+1 ≤ 21,
while the dense formulation multiplies full [L, L] adjacencies (L = 128).
This kernel computes

    out[b, v, :] = Σ_k  coef[b, v, k] · src[b, v + offsets[k], :]

touching only the band: K·L·D MACs instead of L²·D — ~12× less work for
COGMEN, ~6× for DialogueGCN at L=128 — and streams src through VMEM with
static shifted slices (no gathers, fully vectorized on the VPU).

The kernel pads the src slab by (maxoff - minoff) rows so each shift is a
static slice; out-of-range taps are zeroed by coef (the caller builds coef
from the window/validity masks, so no masking is needed inside).

A custom VJP makes it trainable:  d/dsrc is the same banded op with
flipped offsets and transposed coef; d/dcoef is a banded dot product.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def banded_gather_sum_reference(coef, src, offsets):
    """Pure-jnp reference: out[b,v] = Σ_k coef[b,v,k] · src[b, v+off_k]."""
    B, L, D = src.shape
    out = jnp.zeros((B, L, D), src.dtype)
    for k, off in enumerate(offsets):
        rolled = jnp.roll(src, -off, axis=1)
        # positions where v+off is out of range contribute via coef==0;
        # zero them anyway to keep the reference exact for any coef
        v = jnp.arange(L)
        valid = ((v + off) >= 0) & ((v + off) < L)
        out = out + coef[:, :, k : k + 1] * rolled * valid[None, :, None]
    return out


def _fwd_kernel(coef_ref, src_ref, out_ref, *, offsets, pad_lo, TV):
    # coef_ref block: [TV, K]; src_ref block: full padded rows [Lp, D];
    # out_ref block: [TV, D].  Tap u = v + off lives at padded row
    # v + off + pad_lo; with v0 = i*TV the slab starts at v0 + off + pad_lo.
    i = pl.program_id(1)
    v0 = i * TV
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k, off in enumerate(offsets):
        slab = src_ref[pl.ds(v0 + (off + pad_lo), TV), :]
        acc = acc + coef_ref[:, k : k + 1].astype(jnp.float32) * slab.astype(jnp.float32)
    out_ref[:, :] = acc.astype(out_ref.dtype)


def _banded_fwd_pallas(coef, src, offsets: Tuple[int, ...], TV: int = 128):
    B, L, D = src.shape
    K = len(offsets)
    minoff, maxoff = min(offsets), max(offsets)
    # pad src rows so every tap is an in-range slice
    pad_lo, pad_hi = max(0, -minoff), max(0, maxoff + TV)
    srcp = jnp.pad(src, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    Lp = srcp.shape[1]
    TV = min(TV, L)
    grid = (B, pl.cdiv(L, TV))

    kernel = functools.partial(_fwd_kernel, offsets=offsets, pad_lo=pad_lo, TV=TV)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, TV, K), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, Lp, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, TV, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, D), src.dtype),
        interpret=not _on_tpu(),
    )(coef, srcp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def banded_gather_sum(coef, src, offsets: Tuple[int, ...]):
    """out[b, v] = Σ_k coef[b, v, k] · src[b, v + offsets[k]].

    coef: [B, L, K] (zero for invalid taps); src: [B, L, D];
    offsets: static ints. Runs as a Pallas kernel on TPU, interpreted
    elsewhere; differentiable in coef and src.
    """
    return _banded_fwd_pallas(coef, src, tuple(int(o) for o in offsets))


def _bgs_fwd(coef, src, offsets):
    return banded_gather_sum(coef, src, offsets), (coef, src)


def _bgs_bwd(offsets, res, g):
    coef, src = res
    # d src[b, u] = Σ_k coef[b, u - off_k, k] · g[b, u - off_k]
    #             = banded sum over flipped offsets of (coef_k ⊙ g)
    L = src.shape[1]
    K = len(offsets)
    dsrc = jnp.zeros_like(src)
    for k, off in enumerate(offsets):
        contrib = coef[:, :, k : k + 1] * g  # [B, L(v), D]
        rolled = jnp.roll(contrib, off, axis=1)
        u = jnp.arange(L)
        valid = ((u - off) >= 0) & ((u - off) < L)
        dsrc = dsrc + rolled * valid[None, :, None]
    # d coef[b, v, k] = g[b, v] · src[b, v + off_k]
    dcoefs = []
    for k, off in enumerate(offsets):
        rolled = jnp.roll(src, -off, axis=1)
        v = jnp.arange(L)
        valid = ((v + off) >= 0) & ((v + off) < L)
        dcoefs.append((g * rolled * valid[None, :, None]).sum(-1))
    dcoef = jnp.stack(dcoefs, -1)
    return dcoef, dsrc


banded_gather_sum.defvjp(_bgs_fwd, _bgs_bwd)


def band_offsets(wp: int, wf: int) -> Tuple[int, ...]:
    """Offsets of sources u = v + o feeding target v: o ∈ [-wf, wp].

    (edge u→v exists iff v ∈ [u-wp, u+wf] ⟺ u-v ∈ [-wf, wp].)
    """
    return tuple(range(-wf, wp + 1))


# ---------------------------------------------------------------- banded dot


def banded_dot_reference(a, b, offsets):
    """out[b, v, k] = a[b, v, :] · b[b, v + off_k, :] (0 out of range)."""
    B, L, D = a.shape
    outs = []
    v = jnp.arange(L)
    for off in offsets:
        rolled = jnp.roll(b, -off, axis=1)
        valid = ((v + off) >= 0) & ((v + off) < L)
        outs.append((a * rolled).sum(-1) * valid[None, :])
    return jnp.stack(outs, -1)


def _dot_kernel(a_ref, b_ref, out_ref, *, offsets, pad_lo, TV):
    i = pl.program_id(1)
    v0 = i * TV
    av = a_ref[:, :].astype(jnp.float32)
    cols = []
    for k, off in enumerate(offsets):
        slab = b_ref[pl.ds(v0 + (off + pad_lo), TV), :].astype(jnp.float32)
        cols.append(jnp.sum(av * slab, axis=-1, keepdims=True))
    out_ref[:, :] = jnp.concatenate(cols, -1).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def banded_dot(a, b, offsets: Tuple[int, ...]):
    """Banded pairwise dot products: out[b, v, k] = a_v · b_{v+off_k}.

    The windowed-attention score op: K·L·D MACs instead of the dense
    [L, L] @ [L, D] product.
    """
    offsets = tuple(int(o) for o in offsets)
    B, L, D = a.shape
    K = len(offsets)
    minoff, maxoff = min(offsets), max(offsets)
    TV = min(128, L)
    pad_lo, pad_hi = max(0, -minoff), max(0, maxoff + TV)
    bp = jnp.pad(b, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    Lp = bp.shape[1]
    kernel = functools.partial(_dot_kernel, offsets=offsets, pad_lo=pad_lo, TV=TV)
    return pl.pallas_call(
        kernel,
        grid=(B, pl.cdiv(L, TV)),
        in_specs=[
            pl.BlockSpec((None, TV, D), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((None, Lp, D), lambda bb, i: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, TV, K), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, K), a.dtype),
        interpret=not _on_tpu(),
    )(a, bp)


def _bd_fwd(a, b, offsets):
    return banded_dot(a, b, offsets), (a, b)


def _bd_bwd(offsets, res, g):
    a, b = res
    L = a.shape[1]
    v = jnp.arange(L)
    da = jnp.zeros_like(a)
    db = jnp.zeros_like(b)
    for k, off in enumerate(offsets):
        gk = g[:, :, k : k + 1]  # [B, L, 1]
        rolled_b = jnp.roll(b, -off, axis=1)
        valid = (((v + off) >= 0) & ((v + off) < L))[None, :, None]
        da = da + gk * rolled_b * valid
        contrib = gk * a * valid
        db = db + jnp.roll(contrib, off, axis=1) * (
            (((v - off) >= 0) & ((v - off) < L))[None, :, None]
        )
    return da, db


banded_dot.defvjp(_bd_fwd, _bd_bwd)
