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


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _band_geometry(L: int, offsets: Tuple[int, ...], TV: int = 128):
    """Sublane-aligned slab geometry shared by both kernels.

    Mosaic only supports dynamic sublane loads at multiples of 8 once the
    lane dim exceeds one 128-wide tile, so each block loads ONE aligned
    slab covering every tap ([v0+shift, v0+shift+SLAB), shift ≡ 0 mod 8)
    and taps are realized as static rotates + an offset-0 slice.
    """
    minoff, maxoff = min(offsets), max(offsets)
    TV = min(TV, _round8(L))
    span = maxoff - minoff
    pad_lo0 = max(0, -minoff)
    # extra left pad so shift = minoff + pad_lo is a multiple of 8
    extra = (-(minoff + pad_lo0)) % 8
    pad_lo = pad_lo0 + extra
    shift = minoff + pad_lo
    SLAB = _round8(TV + span)
    n_blocks = -(-L // TV)
    need = (n_blocks - 1) * TV + shift + SLAB
    pad_hi = max(0, need - (pad_lo + L))
    return TV, pad_lo, pad_hi, shift, SLAB, n_blocks


def _tap(slab, rel: int, TV: int):
    """Rows [rel, rel+TV) of a loaded slab, via rotate + aligned slice
    (compiled; pltpu.roll wants a non-negative shift, so rotate by
    SLAB-rel) or a direct static slice (interpret)."""
    if rel == 0:
        return slab[:TV]
    if _on_tpu():
        return pltpu.roll(slab, slab.shape[0] - rel, 0)[:TV]
    return jax.lax.slice_in_dim(slab, rel, rel + TV, axis=0)


def _fwd_kernel(coef_ref, src_ref, out_ref, *, offsets, shift, TV, SLAB):
    # coef_ref block: [TV, K]; src_ref block: full padded rows [Lp, D];
    # out_ref block: [TV, D].  Tap u = v + off lives at padded row
    # v + off + pad_lo = (v0 + shift) + (off - minoff) + v_local.
    i = pl.program_id(1)
    v0 = i * TV
    minoff = min(offsets)
    slab_full = src_ref[pl.ds(v0 + shift, SLAB), :].astype(jnp.float32)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k, off in enumerate(offsets):
        slab = _tap(slab_full, off - minoff, TV)
        acc = acc + coef_ref[:, k : k + 1].astype(jnp.float32) * slab
    out_ref[:, :] = acc.astype(out_ref.dtype)


def _banded_fwd_pallas(coef, src, offsets: Tuple[int, ...], TV: int = 128):
    B, L, D = src.shape
    K = len(offsets)
    TV, pad_lo, pad_hi, shift, SLAB, n_blocks = _band_geometry(L, offsets, TV)
    srcp = jnp.pad(src, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    Lp = srcp.shape[1]
    grid = (B, n_blocks)

    kernel = functools.partial(_fwd_kernel, offsets=offsets, shift=shift, TV=TV, SLAB=SLAB)
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


def _dot_kernel(a_ref, b_ref, out_ref, *, offsets, shift, TV, SLAB):
    i = pl.program_id(1)
    v0 = i * TV
    minoff = min(offsets)
    av = a_ref[:, :].astype(jnp.float32)
    slab_full = b_ref[pl.ds(v0 + shift, SLAB), :].astype(jnp.float32)
    cols = []
    for k, off in enumerate(offsets):
        slab = _tap(slab_full, off - minoff, TV)
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
    TV, pad_lo, pad_hi, shift, SLAB, n_blocks = _band_geometry(L, offsets)
    bp = jnp.pad(b, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    Lp = bp.shape[1]
    kernel = functools.partial(_dot_kernel, offsets=offsets, shift=shift, TV=TV, SLAB=SLAB)
    return pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
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
