"""Banded graph layers ≡ dense masked layers on windowed graphs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from erc_tpu.ops import graphs
from erc_tpu.ops.gnn import DenseRGCN, DenseTransformerConv
from erc_tpu.ops.gnn_banded import (
    BandedRGCN,
    BandedTransformerConv,
    banded_relational_messages,
    _tap_valid,
)
from erc_tpu.ops.pallas.banded import band_offsets


def _setup(B=2, L=24, D=12, S=2, seed=0, lengths=(24, 13)):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    spk = rng.integers(0, S, (B, L)).astype(np.int32)
    lengths = np.asarray(lengths, np.int32)
    mask = (np.arange(L)[None] < lengths[:, None]).astype(np.float32)
    return x, spk, lengths, mask


@pytest.mark.parametrize("aggr", ["mean", "add"])
@pytest.mark.parametrize("wp,wf", [(5, 5), (3, 1)])
def test_banded_messages_match_dense(aggr, wp, wf):
    from erc_tpu.ops.gnn import relational_message_passing

    B, L, D, S, Dout = 2, 24, 12, 2, 8
    x, spk, lengths, mask = _setup(B, L, D, S)
    R = 2 * S * S
    rng = np.random.default_rng(1)
    W = rng.normal(size=(R, D, Dout)).astype(np.float32)

    adj = graphs.window_adjacency(lengths, L, wp, wf)
    rel = graphs.relation_ids(spk, S)
    offsets = band_offsets(wp, wf)

    enorm_dense = None
    enorm_band = None
    if aggr == "add":
        enorm_dense = rng.uniform(0.2, 1.0, (B, L, L)).astype(np.float32)
        # band view: tap k of target v is source u = v + off_k
        enorm_band = np.zeros((B, L, len(offsets)), np.float32)
        for k, off in enumerate(offsets):
            for v in range(L):
                u = v + off
                if 0 <= u < L:
                    enorm_band[:, v, k] = enorm_dense[:, u, v]

    want = np.asarray(
        relational_message_passing(
            jnp.asarray(x), adj, rel, jnp.asarray(W),
            None if enorm_dense is None else jnp.asarray(enorm_dense), aggr,
        )
    )
    got = np.asarray(
        banded_relational_messages(
            jnp.asarray(x), jnp.asarray(spk), jnp.asarray(mask), jnp.asarray(W),
            wp, wf, S, aggr,
            None if enorm_band is None else jnp.asarray(enorm_band),
        )
    )
    for b, ln in enumerate([24, 13]):
        np.testing.assert_allclose(got[b, :ln], want[b, :ln], rtol=1e-4, atol=1e-5)


def test_banded_transformer_conv_matches_dense():
    B, L, D, S = 2, 24, 16, 2
    x, spk, lengths, mask = _setup(B, L, D, S, seed=3)
    wp = wf = 5
    dense = DenseTransformerConv(D)
    banded = BandedTransformerConv(D, wp, wf)
    adj = graphs.window_adjacency(lengths, L, wp, wf)
    params = dense.init(jax.random.PRNGKey(0), jnp.asarray(x), adj)["params"]
    want = np.asarray(dense.apply({"params": params}, jnp.asarray(x), adj))
    got = np.asarray(banded.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask)))
    for b, ln in enumerate([24, 13]):
        np.testing.assert_allclose(got[b, :ln], want[b, :ln], rtol=1e-4, atol=1e-4)


def test_banded_rgcn_module_matches_dense():
    B, L, D, S, Dout = 2, 24, 12, 2, 8
    x, spk, lengths, mask = _setup(B, L, D, S, seed=4)
    wp = wf = 5
    R = 2 * S * S
    dense = DenseRGCN(Dout, R, aggr="mean")
    banded = BandedRGCN(Dout, R, S, wp, wf, aggr="mean")
    adj = graphs.window_adjacency(lengths, L, wp, wf)
    rel = graphs.relation_ids(spk, S)
    params = dense.init(jax.random.PRNGKey(1), jnp.asarray(x), adj, rel)["params"]
    want = np.asarray(dense.apply({"params": params}, jnp.asarray(x), adj, rel))
    got = np.asarray(
        banded.apply({"params": params}, jnp.asarray(x), jnp.asarray(spk), jnp.asarray(mask))
    )
    for b, ln in enumerate([24, 13]):
        np.testing.assert_allclose(got[b, :ln], want[b, :ln], rtol=1e-4, atol=1e-4)


def test_tap_valid():
    mask = np.zeros((1, 6), np.float32)
    mask[0, :4] = 1
    tap = np.asarray(_tap_valid(jnp.asarray(mask), (-1, 0, 2)))
    # target v=0: taps at -1 (invalid), 0 (valid), 2 (valid)
    np.testing.assert_array_equal(tap[0, 0], [0, 1, 1])
    # target v=3: source 2 valid, 3 valid, 5 invalid (masked)
    np.testing.assert_array_equal(tap[0, 3], [1, 1, 0])
    # padded target v=4: all zero
    np.testing.assert_array_equal(tap[0, 4], [0, 0, 0])


def test_dgcn_module_banded_matches_dense():
    """Whole-model parity: DGCNModule with graph_impl banded vs dense."""
    import os

    from erc_tpu.models.dgcn import DGCNModule
    from erc_tpu.data.synthetic import synthetic_erc
    from erc_tpu.data.collate import ERCBatcher

    samples = synthetic_erc("iemocap-cogmen", 6, n_train=4, min_len=10, max_len=20)
    batch = ERCBatcher("atv", 6, 2, max_len=24)(samples)
    kw = dict(input_size=712, hidden_size=64, n_speakers=2, wp=10, wf=10, n_classes=6)
    dense = DGCNModule(graph_impl="dense", **kw)
    banded = DGCNModule(graph_impl="banded", **kw)
    pd = dense.init(jax.random.PRNGKey(0), batch, deterministic=True)["params"]
    pb = dict(banded.init(jax.random.PRNGKey(0), batch, deterministic=True)["params"])
    # graft dense params into the banded layout
    pb["rnn"] = pd["rnn"]
    pb["edge_att"] = pd["edge_att"]
    pb["conv1"] = pd["conv1"]
    pb["conv2_lin_rel"] = pd["conv2"]["lin_rel"]
    pb["conv2_lin_root"] = pd["conv2"]["lin_root"]
    pb["clf_lin1"] = pd["clf_lin1"]
    pb["clf_lin2"] = pd["clf_lin2"]
    want = np.asarray(dense.apply({"params": pd}, batch, deterministic=True))
    got = np.asarray(banded.apply({"params": pb}, batch, deterministic=True))
    m = batch["attention_mask"][..., None] > 0
    np.testing.assert_allclose(
        np.where(m, got, 0), np.where(m, want, 0), rtol=1e-4, atol=1e-4
    )


def test_mmgcn_structured_matches_dense():
    """Structured big-adjacency GCNII ≡ dense (M·L)² form."""
    from erc_tpu.models.mmgcn import MMGCNModule
    from erc_tpu.data.synthetic import synthetic_erc
    from erc_tpu.data.collate import ERCBatcher

    samples = synthetic_erc("iemocap-cogmen", 6, n_train=3, min_len=6, max_len=12)
    batch = ERCBatcher("atv", 6, 2, max_len=16)(samples)
    kw = dict(hidden_text=100, hidden_audio=100, hidden_visual=512,
              n_speakers=2, n_classes=6, gcn_layers=4)
    dense = MMGCNModule(adj_impl="dense", **kw)
    struct = MMGCNModule(adj_impl="structured", **kw)
    pd = dense.init(jax.random.PRNGKey(0), batch, deterministic=True)["params"]
    want = np.asarray(dense.apply({"params": pd}, batch, deterministic=True))
    got = np.asarray(struct.apply({"params": pd}, batch, deterministic=True))
    m = batch["attention_mask"][..., None] > 0
    np.testing.assert_allclose(
        np.where(m, got, 0), np.where(m, want, 0), rtol=1e-4, atol=1e-4
    )
