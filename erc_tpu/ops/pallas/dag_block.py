"""Fused Pallas kernel for DAG-ERC's within-block recurrence.

One DAG layer runs as a blockwise-prefix scan (models/dagerc.DAGStack):
per block of C utterances, the attention against *previous* blocks is a
pair of MXU einsums (XLA handles those well), while the C-position
sequential tail — combine the two softmax halves, dual GRU, output
transforms — is ~20 small ops per position that XLA schedules as
individual kernels.  Measured on v5e (B=32, L=96, D=300, 4 layers) the
XLA forward is 4.3 ms and its AD backward 19 ms — per-op sequencing, not
FLOPs or HBM.  This module fuses the whole C-position tail into ONE
kernel (everything lives in VMEM/registers) with a hand-written
backward that *recomputes* per-position activations from the kernel's
own outputs instead of streaming AD residuals.

Layout note: gates are carried as separate [·, 3, D] / [3, D, D] arrays
— Mosaic cannot concatenate/split vectors at non-128-aligned lane
offsets (D = 300), so the torch [3D] gate packing stays outside.

Replay safety: the backward rebuilds step-c attention from the FINAL
V0w/V1w/Kw buffers.  Rows j ≥ c differ from the step-c view (they were
still zero), but every such column carries an additive −1e30 mask, so
its softmax weight and weight-gradient underflow to exact 0 — except on
rows with an empty predecessor set.  Gradients through the running-max
rescale use honest partials (the total-cancellation happens in the
XLA-side combination with ∂num/∂mp).

GRADIENT CONTRACT: outputs at positions with an *empty* predecessor set
are exact in the forward but replay-divergent in the backward UNLESS the
position is flag-gated (global position 0) or its cotangents are zero.
DAG-ERC satisfies this by construction — ``dag_adjacency`` gives every
valid i ≥ 1 at least predecessor i−1, and empty rows beyond the dialogue
length are loss-masked with zero-weight reads (tests:
test_pallas_dag_block.py).

Reference semantics: GAT_dialoggcn_v1 + dual GRUCell,
track_mm/dagerc_models.py:312-365 / dagerc.py:156-198.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mxu_dtype():
    """Match the XLA path's matmul precision: the trainer runs with
    jax_default_matmul_precision='bfloat16' (MXU-native); full-f32 matmuls
    inside the kernel would be both slower (multi-pass) and numerically
    different from the XLA path.  TPU-only: the CPU backend ignores the
    precision flag, so interpret-mode runs (tests) must not cast either.
    """
    if jax.default_backend() != "tpu":
        return None
    prec = jax.config.jax_default_matmul_precision
    if prec in ("bfloat16", "tensorfloat32", "fastest", "default"):
        return jnp.bfloat16
    return None


def _dot(a, b, dims=None):
    dt = _mxu_dtype()
    if dt is not None:
        a = a.astype(dt)
        b = b.astype(dt)
    if dims is None:
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _gru_gates(xr, xz, xn, hr, hz, hn, h):
    """torch GRUCell from per-gate projections."""
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h, (r, z, n)


def _attend(qc, Kw, amw_c, smw_c, V0w, V1w, num01_c, den_p_c, mp_c):
    """Step-c attention combine; returns M and the recompute pack.

    Every reduced quantity stays 2-D [B, 1] — Mosaic lowers 1-D
    intermediates through gathers it cannot always handle."""
    lw = qc + Kw + amw_c  # [B, C]
    mw = jnp.max(lw, axis=-1, keepdims=True)  # [B, 1]
    ew = jnp.exp(lw - mw)
    e0w = ew * smw_c
    e1w = ew - e0w
    n0 = jnp.sum(e0w[:, :, None] * V0w, axis=1)  # [B, D] (VPU — C is small)
    n1 = jnp.sum(e1w[:, :, None] * V1w, axis=1)
    nw = n0 + n1
    dnw = jnp.sum(ew, axis=-1, keepdims=True)  # [B, 1]
    m = jnp.maximum(mp_c, mw)  # [B, 1]
    sp = jnp.exp(mp_c - m)  # [B, 1]
    sw = jnp.exp(mw - m)
    den = den_p_c * sp + dnw * sw
    M = (num01_c * sp + nw * sw) / den
    return M, (lw, mw, ew, e0w, e1w, nw, dnw, sp, sw, den)


def _mm3(x, W3, b3):
    """x @ W3[g] + b3[g] for the 3 gates → tuple of [B, D]."""
    return tuple(_dot(x, W3[g]) + b3[g : g + 1, :] for g in range(3))


def _step_fwd(c, flag, qb, xcb, hppb, hb, num01, den_p, mp, amw, smw,
              Whc, bhc, Wip, bip, Wr0T, Wr1T, wkc, Kw, V0w, V1w):
    """Recompute position c's forward given the (live or final) buffers."""
    M, pack = _attend(
        qb[:, c : c + 1], Kw, amw[:, c], smw[:, c], V0w, V1w,
        num01[:, c], den_p[:, c : c + 1], mp[:, c : c + 1],
    )
    if c == 0:
        M = jnp.where(flag > 0, 0.0, M)
    hpc = _mm3(M, Whc, bhc)  # node-GRU hidden proj (h = M)
    xpp = _mm3(M, Wip, bip)  # proxy-GRU input proj (x = M)
    Cg, g1 = _gru_gates(
        xcb[:, c, 0], xcb[:, c, 1], xcb[:, c, 2], hpc[0], hpc[1], hpc[2], M
    )
    P, g2 = _gru_gates(
        xpp[0], xpp[1], xpp[2],
        hppb[:, c, 0], hppb[:, c, 1], hppb[:, c, 2], hb[:, c],
    )
    h1 = Cg + P
    v0 = _dot(h1, Wr0T)
    v1 = _dot(h1, Wr1T)
    kw = _dot(h1, wkc)  # [B, 1]
    return M, pack, hpc, xpp, g1, g2, h1, v0, v1, kw


def _fwd_body(flag, qb, xcb, hppb, hb, num01, den_p, mp, amw, smw,
              Whc, bhc, Wip, bip, Wr0T, Wr1T, wkc):
    """Pure-jax reference of the whole block tail (tests + AD oracle)."""
    B, C = qb.shape
    D = hb.shape[-1]
    V0w = jnp.zeros((B, C, D), qb.dtype)
    V1w = jnp.zeros((B, C, D), qb.dtype)
    Kw = jnp.zeros((B, C), qb.dtype)
    h1s = []
    for c in range(C):
        _, _, _, _, _, _, h1, v0, v1, kw = _step_fwd(
            c, flag, qb, xcb, hppb, hb, num01, den_p, mp, amw, smw,
            Whc, bhc, Wip, bip, Wr0T, Wr1T, wkc, Kw, V0w, V1w,
        )
        V0w = V0w.at[:, c].set(v0)
        V1w = V1w.at[:, c].set(v1)
        Kw = Kw.at[:, c].set(kw[:, 0])
        h1s.append(h1)
    return jnp.stack(h1s, axis=1), V0w, V1w, Kw


def _fwd_kernel(flag_ref, qb, xcb, hppb, hb, num01, den_p, mp, amw, smw,
                Whc, bhc, Wip, bip, Wr0T, Wr1T, wkc,
                h1_o, v0_o, v1_o, kw_o, hpc_o, xpp_o):
    C = qb.shape[1]
    flag = flag_ref[0]
    v0_o[:] = jnp.zeros(v0_o.shape, v0_o.dtype)
    v1_o[:] = jnp.zeros(v1_o.shape, v1_o.dtype)
    kw_o[:] = jnp.zeros(kw_o.shape, kw_o.dtype)
    for c in range(C):
        _, _, hpc, xpp, _, _, h1, v0, v1, kw = _step_fwd(
            c, flag, qb, xcb, hppb, hb, num01, den_p, mp, amw, smw,
            Whc[:], bhc[:], Wip[:], bip[:], Wr0T[:], Wr1T[:], wkc[:],
            kw_o[:], v0_o[:], v1_o[:],
        )
        v0_o[:, c, :] = v0
        v1_o[:, c, :] = v1
        kw_o[:, c : c + 1] = kw
        h1_o[:, c, :] = h1
        # gate projections are the backward's residuals: the bwd kernel
        # then needs NO matmuls to recompute the gates
        for gi in range(3):
            hpc_o[:, c, gi, :] = hpc[gi]
            xpp_o[:, c, gi, :] = xpp[gi]


def _gru_bwd(g, hn_proj, h, r, z, n):
    """VJP of _gru_gates → per-gate (dxr,dxz,dxn), (dhr,dhz,dhn), dh."""
    dz = g * (h - n)
    dn = g * (1.0 - z)
    dh = g * z
    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * hn_proj
    dhn = dn_pre * r
    dz_pre = dz * z * (1.0 - z)
    dr_pre = dr * r * (1.0 - r)
    return (dr_pre, dz_pre, dn_pre), (dr_pre, dz_pre, dhn), dh


def _bwd_kernel(flag_ref, qb, xcb, hppb, hb, num01, den_p, mp, amw, smw,
                Whc, bhc, Wip, bip, Wr0T, Wr1T, wkc,
                h1f, v0f, v1f, kwf, hpcf, xppf,
                dh1, dv0_in, dv1_in, dkw_in,
                dqb_o, dxcb_o, dhppb_o, dhb_o, dnum01_o, dden_p_o, dmp_o,
                dWhc_o, dbhc_o, dWip_o, dbip_o, dWr0T_o, dWr1T_o, dwkc_o,
                m_st, dhpc_st, dxpp_st):
    """Reverse the block tail.

    Per reverse position: VPU-only recompute (attention from the final
    K/V buffers, gates from the saved projections) + 9 small matmuls that
    are inherently sequential (cotangent accumulation through the
    buffers).  All WEIGHT gradients are deferred to three batched
    contractions over every (batch, position) pair at the end — K=B·C
    fills the MXU instead of 2·C rank-B updates."""
    B, C = qb.shape
    flag = flag_ref[0]
    dV0 = dv0_in[:]
    dV1 = dv1_in[:]
    dKw = dkw_in[:]
    for c in range(C - 1, -1, -1):
        # ---- recompute (no matmuls: projections come from the residuals)
        M, pack = _attend(
            qb[:, c : c + 1], kwf[:], amw[:, c], smw[:, c], v0f[:], v1f[:],
            num01[:, c], den_p[:, c : c + 1], mp[:, c : c + 1],
        )
        if c == 0:
            M = jnp.where(flag > 0, 0.0, M)
        lw, mw, ew, e0w, e1w, nw, dnw, sp, sw, den = pack
        hpc = (hpcf[:, c, 0], hpcf[:, c, 1], hpcf[:, c, 2])
        xpp = (xppf[:, c, 0], xppf[:, c, 1], xppf[:, c, 2])
        r1 = jax.nn.sigmoid(xcb[:, c, 0] + hpc[0])
        z1 = jax.nn.sigmoid(xcb[:, c, 1] + hpc[1])
        n1g = jnp.tanh(xcb[:, c, 2] + r1 * hpc[2])
        r2 = jax.nn.sigmoid(xpp[0] + hppb[:, c, 0])
        z2 = jax.nn.sigmoid(xpp[1] + hppb[:, c, 1])
        n2g = jnp.tanh(xpp[2] + r2 * hppb[:, c, 2])
        h1 = h1f[:, c, :]
        # ---- backward through the out transforms
        g = dh1[:, c, :]
        dv0c = dV0[:, c, :]
        dv1c = dV1[:, c, :]
        dkwc = dKw[:, c : c + 1]
        g = g + _dot(dv0c, Wr0T[:], (((1,), (1,)), ((), ())))
        g = g + _dot(dv1c, Wr1T[:], (((1,), (1,)), ((), ())))
        g = g + _dot(dkwc, wkc[:], (((1,), (1,)), ((), ())))
        # ---- dual GRU backward (h1 = Cg + P, both get g)
        dxc3, dhpc3, dM = _gru_bwd(g, hpc[2], M, r1, z1, n1g)
        dxpp3, dhpp3, dhb_c = _gru_bwd(g, hppb[:, c, 2], hb[:, c], r2, z2, n2g)
        for gi in range(3):
            dxcb_o[:, c, gi, :] = dxc3[gi]
            dhppb_o[:, c, gi, :] = dhpp3[gi]
            dhpc_st[:, c, gi, :] = dhpc3[gi]
            dxpp_st[:, c, gi, :] = dxpp3[gi]
            dM = dM + _dot(dhpc3[gi], Whc[:][gi], (((1,), (1,)), ((), ())))
            dM = dM + _dot(dxpp3[gi], Wip[:][gi], (((1,), (1,)), ((), ())))
        dhb_o[:, c, :] = dhb_c
        m_st[:, c, :] = M
        if c == 0:
            dM = jnp.where(flag > 0, 0.0, dM)
        # ---- attention combine backward: M = (num01·sp + nw·sw) / den
        dnum_v = dM / den
        dden_s = -jnp.sum(dM * M, axis=-1, keepdims=True) / den  # [B, 1]
        dnum01_o[:, c, :] = dnum_v * sp
        dnw_v = dnum_v * sw
        dsp = (
            jnp.sum(dnum_v * num01[:, c], axis=-1, keepdims=True)
            + dden_s * den_p[:, c : c + 1]
        )
        dsw = jnp.sum(dnum_v * nw, axis=-1, keepdims=True) + dden_s * dnw
        dden_p_o[:, c : c + 1] = dden_s * sp
        ddnw = dden_s * sw
        # sp = exp(mp−m), sw = exp(mw−m), m = max(mp, mw): honest partials
        mp_ge = (mp[:, c : c + 1] >= mw).astype(qb.dtype)
        dmp_c = mp_ge * (-dsw * sw) + (1.0 - mp_ge) * (dsp * sp)
        dmw = mp_ge * (dsw * sw) + (1.0 - mp_ge) * (-dsp * sp)
        dmp_o[:, c : c + 1] = dmp_c
        # nw = Σ e0w·V0w + Σ e1w·V1w ; dnw = Σ ew
        dV0 = dV0 + e0w[:, :, None] * dnw_v[:, None, :]
        dV1 = dV1 + e1w[:, :, None] * dnw_v[:, None, :]
        dew = (
            jnp.sum(dnw_v[:, None, :] * v0f[:], axis=-1) * smw[:, c]
            + jnp.sum(dnw_v[:, None, :] * v1f[:], axis=-1) * (1.0 - smw[:, c])
            + ddnw
        )  # [B, C]
        dlw = dew * ew
        # mw = max_j lw (ties split evenly) + the −Σ dew·ew exp-shift term
        dmw_tot = dmw - jnp.sum(dlw, axis=-1, keepdims=True)  # [B, 1]
        is_max = (lw == mw).astype(qb.dtype)
        dlw = dlw + is_max * (
            dmw_tot / jnp.maximum(jnp.sum(is_max, -1, keepdims=True), 1.0)
        )
        dqb_o[:, c : c + 1] = jnp.sum(dlw, axis=-1, keepdims=True)
        dKw = dKw + dlw
    # ---- batched weight gradients: one MXU contraction each over (B·C)
    # (flattened first — Mosaic's matmul wants a single contracting dim)
    D = hb.shape[-1]
    first = (((0,), (0,)), ((), ()))
    m2 = m_st[:].reshape(B * C, D)
    h2 = h1f[:].reshape(B * C, D)
    for gi in range(3):
        dhpc2 = dhpc_st[:, :, gi, :].reshape(B * C, D)
        dxpp2 = dxpp_st[:, :, gi, :].reshape(B * C, D)
        dWhc_o[gi, :, :] = _dot(m2, dhpc2, first)
        dWip_o[gi, :, :] = _dot(m2, dxpp2, first)
        dbhc_o[gi : gi + 1, :] = jnp.sum(dhpc2, axis=0, keepdims=True)
        dbip_o[gi : gi + 1, :] = jnp.sum(dxpp2, axis=0, keepdims=True)
    dWr0T_o[:] = _dot(h2, dV0.reshape(B * C, D), first)
    dWr1T_o[:] = _dot(h2, dV1.reshape(B * C, D), first)
    # [D,1]-shaped reshapes (lane→sublane) don't lower; reduce on the VPU
    # into [1, D] and let the XLA wrapper transpose
    dwkc_o[:] = jnp.sum(
        jnp.sum(h1f[:] * dKw[:, :, None], axis=0), axis=0, keepdims=True
    )


def _vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _dag_block_all(flag, qb, xcb, hppb, hb, num01, den_p, mp, amw, smw,
                   Whc, bhc, Wip, bip, Wr0T, Wr1T, wkc):
    B, C = qb.shape
    D = hb.shape[-1]
    dt = qb.dtype
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, C, D), dt),       # h1
            jax.ShapeDtypeStruct((B, C, D), dt),       # V0w
            jax.ShapeDtypeStruct((B, C, D), dt),       # V1w
            jax.ShapeDtypeStruct((B, C), dt),          # Kw
            jax.ShapeDtypeStruct((B, C, 3, D), dt),    # hpc residual
            jax.ShapeDtypeStruct((B, C, 3, D), dt),    # xpp residual
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [_vmem()] * 16,
        out_specs=tuple(_vmem() for _ in range(6)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,  # default 16M scoped limit
        ),
        interpret=_interpret(),
    )(flag, qb, xcb, hppb, hb, num01, den_p, mp, amw, smw,
      Whc, bhc, Wip, bip, Wr0T, Wr1T, wkc)


@jax.custom_vjp
def dag_block(flag, qb, xcb, hppb, hb, num01, den_p, mp, amw, smw,
              Whc, bhc, Wip, bip, Wr0T, Wr1T, wkc):
    """Fused within-block DAG recurrence.

    flag [1] int32 (1 ⇒ global position 0 is in this block; its M is
    zeroed).  qb [B,C] (queries, attention bias pre-added), xcb/hppb
    [B,C,3,D] per-gate projections, hb [B,C,D], prefix combine inputs
    num01 [B,C,D] / den_p, mp [B,C], within masks amw/smw [B,C,C],
    weights Whc/Wip [3,D,D], bhc/bip [3,D], Wr0T/Wr1T [D,D], wkc [D,1].
    Returns (h1 [B,C,D], V0w, V1w [B,C,D], Kw [B,C])."""
    return _dag_block_all(flag, qb, xcb, hppb, hb, num01, den_p, mp, amw,
                          smw, Whc, bhc, Wip, bip, Wr0T, Wr1T, wkc)[:4]


def _dag_block_fwd(*args):
    outs = _dag_block_all(*args)
    return outs[:4], (args, outs)


def _dag_block_bwd(res, cts):
    args, outs = res
    (flag, qb, xcb, hppb, hb, num01, den_p, mp, amw, smw,
     Whc, bhc, Wip, bip, Wr0T, Wr1T, wkc) = args
    h1, V0w, V1w, Kw, hpcf, xppf = outs
    dh1, dV0, dV1, dKw = cts
    B, C = qb.shape
    D = hb.shape[-1]
    dt = qb.dtype
    grads = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, C), dt),          # dqb
            jax.ShapeDtypeStruct((B, C, 3, D), dt),    # dxcb
            jax.ShapeDtypeStruct((B, C, 3, D), dt),    # dhppb
            jax.ShapeDtypeStruct((B, C, D), dt),       # dhb
            jax.ShapeDtypeStruct((B, C, D), dt),       # dnum01
            jax.ShapeDtypeStruct((B, C), dt),          # dden_p
            jax.ShapeDtypeStruct((B, C), dt),          # dmp
            jax.ShapeDtypeStruct((3, D, D), dt),       # dWhc
            jax.ShapeDtypeStruct((3, D), dt),          # dbhc
            jax.ShapeDtypeStruct((3, D, D), dt),       # dWip
            jax.ShapeDtypeStruct((3, D), dt),          # dbip
            jax.ShapeDtypeStruct((D, D), dt),          # dWr0T
            jax.ShapeDtypeStruct((D, D), dt),          # dWr1T
            jax.ShapeDtypeStruct((1, D), dt),          # dwkc (transposed)
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [_vmem()] * 26,
        out_specs=tuple(_vmem() for _ in range(14)),
        scratch_shapes=[
            pltpu.VMEM((B, C, D), jnp.float32),        # m_st
            pltpu.VMEM((B, C, 3, D), jnp.float32),     # dhpc_st
            pltpu.VMEM((B, C, 3, D), jnp.float32),     # dxpp_st
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(flag, qb, xcb, hppb, hb, num01, den_p, mp, amw, smw,
      Whc, bhc, Wip, bip, Wr0T, Wr1T, wkc,
      h1, V0w, V1w, Kw, hpcf, xppf, dh1, dV0, dV1, dKw)
    (dqb, dxcb, dhppb, dhb, dnum01, dden_p, dmp,
     dWhc, dbhc, dWip, dbip, dWr0T, dWr1T, dwkc) = grads
    return (None, dqb, dxcb, dhppb, dhb, dnum01, dden_p, dmp,
            jnp.zeros_like(amw), jnp.zeros_like(smw),
            dWhc, dbhc, dWip, dbip, dWr0T, dWr1T, dwkc.T)


dag_block.defvjp(_dag_block_fwd, _dag_block_bwd)
