"""Jaxpr-level MXU-FLOP counter with correct ``lax.scan`` multipliers.

Why this exists: XLA's ``compiled.cost_analysis()['flops']`` counts a
``while`` loop's body ONCE, ignoring the trip count (verified on CPU and
TPU: a 1-trip and a 16-trip scan of the same matmul body report identical
flops).  Every scan-heavy model in this zoo — MMGCN's 64-layer GCNII
stack (8 scan trips), DAG-ERC's blockwise-prefix scan, the BiRNN/
DialogueRNN recurrences — therefore gets its step FLOPs (and the MFU
derived from them) undercounted by the trip count.

This walks the *jaxpr* of the train step instead (post-AD, so backward
and remat-recompute FLOPs are naturally included — same convention as
the lowered-HLO number it replaces) and multiplies each ``scan`` body by
its static ``length``.  Only MXU ops are counted (dot_general +
conv_general_dilated), which is the standard numerator for MFU; VPU
elementwise work is ignored on both sides of the old/new methodology.

``while_loop`` trip counts are not static; the body is counted once and
the result carries ``lower_bound=True`` in that case (nothing in the
erc_tpu hot paths uses while_loop — recurrences are all ``scan``).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax


def _dot_general_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = math.prod(lhs.shape[d] for d in lb) if lb else 1
    contract = math.prod(lhs.shape[d] for d in lc) if lc else 1
    m = math.prod(
        s for d, s in enumerate(lhs.shape) if d not in set(lc) | set(lb)
    )
    n = math.prod(
        s for d, s in enumerate(rhs.shape) if d not in set(rc) | set(rb)
    )
    return 2.0 * batch * m * n * contract


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape  # kernel
    dn = eqn.params["dimension_numbers"]
    # per output element: k_spatial × cin-per-group MACs.  The kernel
    # aval's in-feature dim is ALREADY cin_total/feature_group_count in
    # JAX's conv convention, so grouped/depthwise convs need no further
    # division (tests/test_flops.py covers fgc>1).
    k_spatial = math.prod(rhs[d] for d in dn.rhs_spec[2:])
    cin_per_group = rhs[dn.rhs_spec[1]]
    return 2.0 * math.prod(out) * k_spatial * cin_per_group


def _count(jaxpr) -> tuple[float, bool]:
    """Returns (mxu_flops, is_lower_bound)."""
    total, lower = 0.0, False
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            f, lb = _count(eqn.params["jaxpr"].jaxpr)
            total += f * eqn.params["length"]
            lower |= lb
        elif name == "while":
            f, _ = _count(eqn.params["body_jaxpr"].jaxpr)
            total += f  # trip count unknown → lower bound
            lower = True
        elif name == "cond":
            fs = [_count(b.jaxpr) for b in eqn.params["branches"]]
            total += max(f for f, _ in fs)
            lower |= any(lb for _, lb in fs)
        else:
            # recurse into any call-like primitive (pjit, remat2/checkpoint,
            # custom_vjp/jvp, closed_call, core_call, ...)
            sub = None
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                if key in eqn.params:
                    sub = eqn.params[key]
                    break
            if sub is not None:
                inner = getattr(sub, "jaxpr", sub)
                f, lb = _count(inner)
                total += f
                lower |= lb
    return total, lower


def mxu_flops(fn, *args, **kwargs) -> Dict[str, Any]:
    """MXU (matmul+conv) FLOPs of one call of ``fn(*args)``.

    Returns ``{"flops": float, "lower_bound": bool}``.  ``fn`` should be
    the raw (unjitted) step function; tracing is abstract — no device
    execution happens.
    """
    closed = jax.make_jaxpr(fn, **kwargs)(*args)
    flops, lower = _count(closed.jaxpr)
    return {"flops": flops, "lower_bound": lower}
