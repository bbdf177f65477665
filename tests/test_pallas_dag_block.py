"""Fused DAG within-block kernel (ops/pallas/dag_block) vs its pure-JAX
reference: forward outputs and EVERY input gradient must match AD of the
reference implementation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erc_tpu.ops.pallas import dag_block as dbk

B, C, D = 3, 4, 8


def _inputs(seed=0, with_prefix=True, all_masked_tail=False):
    r = np.random.default_rng(seed)
    f32 = np.float32
    # within-block adjacency: strictly causal random mask with the real
    # dag_adjacency invariant that i−1 is always a predecessor of a valid
    # i ≥ 1 (windowp reaches at least the previous utterance).  Rows with
    # EMPTY predecessor sets (position 0 / padding) are outside the
    # kernel's gradient contract: they are flag-gated or loss-masked.
    adj = (r.random((B, C, C)) < 0.6) & (np.tril(np.ones((C, C)), -1) > 0)
    for c in range(1, C):
        adj[:, c, c - 1] = True
    if all_masked_tail:
        adj[:, -1, :] = False  # a padding-like row (zero cotangent below)
    amw = (-(1.0 - adj.astype(f32)) * 1e30).astype(f32)
    smw = (r.random((B, C, C)) < 0.5).astype(f32)
    qb = r.normal(size=(B, C)).astype(f32)
    xcb = r.normal(size=(B, C, 3, D)).astype(f32)
    hppb = r.normal(size=(B, C, 3, D)).astype(f32)
    hb = r.normal(size=(B, C, D)).astype(f32)
    if with_prefix:
        num01 = r.normal(size=(B, C, D)).astype(f32)
        den_p = (r.random((B, C)) + 0.5).astype(f32)
        mp = r.normal(size=(B, C)).astype(f32)
    else:  # first block: no prefix columns
        num01 = np.zeros((B, C, D), f32)
        den_p = np.zeros((B, C), f32)
        mp = np.full((B, C), np.finfo(f32).min / 2, f32)
    Whc = (r.normal(size=(3, D, D)) * 0.3).astype(f32)
    bhc = (r.normal(size=(3, D)) * 0.1).astype(f32)
    Wip = (r.normal(size=(3, D, D)) * 0.3).astype(f32)
    bip = (r.normal(size=(3, D)) * 0.1).astype(f32)
    Wr0T = (r.normal(size=(D, D)) * 0.3).astype(f32)
    Wr1T = (r.normal(size=(D, D)) * 0.3).astype(f32)
    wkc = (r.normal(size=(D, 1)) * 0.3).astype(f32)
    flag = np.array([0 if with_prefix else 1], np.int32)
    return [jnp.asarray(x) for x in
            (flag, qb, xcb, hppb, hb, num01, den_p, mp, amw, smw,
             Whc, bhc, Wip, bip, Wr0T, Wr1T, wkc)]


NAMES = ["qb", "xcb", "hppb", "hb", "num01", "den_p", "mp", "amw", "smw",
         "Whc", "bhc", "Wip", "bip", "Wr0T", "Wr1T", "wkc"]


@pytest.mark.parametrize("with_prefix,tail", [(True, False), (False, False), (True, True)])
def test_dag_block_forward_matches_reference(with_prefix, tail):
    args = _inputs(0, with_prefix, tail)
    ref = dbk._fwd_body(*args)
    out = dbk.dag_block(*args)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("with_prefix,tail", [(True, False), (True, True)])
def test_dag_block_grads_match_reference_ad(with_prefix, tail):
    args = _inputs(1, with_prefix, tail)
    r = np.random.default_rng(9)
    cts = list(
        jnp.asarray(r.normal(size=s).astype(np.float32))
        for s in [(B, C, D), (B, C, D), (B, C, D), (B, C)]
    )
    if tail:
        # padding-like rows (empty predecessor set) carry zero cotangent —
        # the model contract (loss-masked positions, zero-weight reads)
        cts = [c.at[:, -1].set(0.0) for c in cts]

    def loss_ref(*diff_args):
        outs = dbk._fwd_body(args[0], *diff_args)
        return sum(jnp.vdot(o, ct) for o, ct in zip(outs, cts))

    def loss_ker(*diff_args):
        outs = dbk.dag_block(args[0], *diff_args)
        return sum(jnp.vdot(o, ct) for o, ct in zip(outs, cts))

    n_args = len(args) - 1
    g_ref = jax.grad(loss_ref, argnums=tuple(range(n_args)))(*args[1:])
    g_ker = jax.grad(loss_ker, argnums=tuple(range(n_args)))(*args[1:])
    for n, a, b in zip(NAMES, g_ker, g_ref):
        if n in ("amw", "smw"):  # masks: kernel reports zeros by contract
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3, err_msg=n
        )


def test_dag_block_grads_first_block():
    """flag=1 (global position 0 in block): M≡0 gate must also gate grads."""
    args = _inputs(2, with_prefix=False)

    def loss(fn):
        def f(*diff_args):
            outs = fn(args[0], *diff_args)
            return sum(jnp.sum(o ** 2) for o in outs)
        return f

    g_ref = jax.grad(loss(dbk._fwd_body), argnums=(0, 3, 9))(*args[1:])
    g_ker = jax.grad(loss(dbk.dag_block), argnums=(0, 3, 9))(*args[1:])
    for a, b in zip(g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3)


# ---------------------------------------------------------------- eval wiring

def test_resolve_dag_impl():
    """dag_impl=auto → XLA train form everywhere; pallas eval forward only
    on single-chip TPU (multi-chip eval batches are sharded and a
    pallas_call would not partition; CPU runs the kernel only in tests)."""
    from erc_tpu.models.dagerc import resolve_dag_impl

    assert resolve_dag_impl("auto", "tpu", 1) == ("xla", "pallas")
    assert resolve_dag_impl("auto", "tpu", 8) == ("xla", "xla")
    assert resolve_dag_impl("auto", "cpu", 1) == ("xla", "xla")
    assert resolve_dag_impl("pallas", "cpu", 4) == ("pallas", "pallas")
    assert resolve_dag_impl("xla", "tpu", 1) == ("xla", "xla")


def test_dagerc_eval_impl_switch_matches_xla():
    """impl_eval='pallas' must route ONLY the deterministic apply through
    the fused kernel and reproduce the XLA form's logits (interpret mode
    on CPU) — the module-level proof behind resolve_dag_impl's auto."""
    from erc_tpu.models.dagerc import DAGERCModule

    r = np.random.default_rng(0)
    Bx, L, E = 2, 12, 16
    lengths = np.array([12, 7])
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    batch = {
        "input_tensor": jnp.asarray(r.normal(size=(Bx, L, E)).astype(np.float32)),
        "attention_mask": jnp.asarray(mask),
        "speaker_ids": jnp.asarray(r.integers(0, 2, (Bx, L))),
        "text_length": jnp.asarray(lengths),
    }

    def mk(impl_eval):
        return DAGERCModule(
            emb_dim=E, n_classes=4, gnn_layers=2, hidden_dim=8,
            chunk=4, impl="xla", impl_eval=impl_eval,
        )

    variables = mk("").init(jax.random.key(0), batch)
    logits_xla = mk("").apply(variables, batch, deterministic=True)
    logits_pal = mk("pallas").apply(variables, batch, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(logits_xla), np.asarray(logits_pal), atol=2e-5, rtol=2e-5
    )
