"""Golden tests: dense GNN layers vs edge-list scatter oracles (numpy ports
of the documented PyG math and the reference's GCNII GraphConvolution)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from erc_tpu.ops import graphs
from erc_tpu.ops.gnn import (
    DenseGraphConv,
    DenseRGCN,
    DenseTransformerConv,
    GCNIIStack,
    relational_message_passing,
)
from erc_tpu.ops.norm import MaskedBatchNorm


def _edges_from_adj(adj_b):
    return [(u, v) for u in range(adj_b.shape[0]) for v in range(adj_b.shape[1]) if adj_b[u, v] > 0]


def rgcn_oracle(x, edges, rel, weights, root, bias, edge_norm=None, aggr="mean"):
    """Scatter RGCN over an edge list: PyG semantics (models/rgcn.py:324-355)."""
    N, D = x.shape
    Dout = weights.shape[-1]
    out = np.zeros((N, Dout), np.float32)
    if aggr == "mean":
        for v in range(N):
            for r in range(weights.shape[0]):
                srcs = [u for (u, vv) in edges if vv == v and rel[u, vv] == r]
                if srcs:
                    msgs = np.stack([x[u] @ weights[r] for u in srcs])
                    out[v] += msgs.mean(0)
    else:
        for (u, v) in edges:
            m = x[u] @ weights[rel[u, v]]
            if edge_norm is not None:
                m = m * edge_norm[u, v]
            out[v] += m
    return out + x @ root + bias


def test_relational_message_passing_mean_and_add():
    rng = np.random.default_rng(0)
    B, L, D, Dout, S = 2, 6, 5, 4, 2
    R = 2 * S * S
    lengths = np.array([6, 3])
    spk = rng.integers(0, S, (B, L))
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    W = rng.normal(size=(R, D, Dout)).astype(np.float32)
    adj = np.asarray(graphs.window_adjacency(lengths, L, 2, 2))
    rel = np.asarray(graphs.relation_ids(spk, S))
    enorm = rng.uniform(0.1, 1.0, (B, L, L)).astype(np.float32)

    for aggr, en in [("mean", None), ("add", enorm)]:
        got = np.asarray(
            relational_message_passing(
                jnp.asarray(x), jnp.asarray(adj), jnp.asarray(rel), jnp.asarray(W),
                None if en is None else jnp.asarray(en), aggr
            )
        )
        for b in range(B):
            edges = _edges_from_adj(adj[b])
            want = rgcn_oracle(
                x[b], edges, rel[b], W, np.zeros((D, Dout), np.float32), np.zeros(Dout, np.float32),
                None if en is None else en[b], aggr
            )
            ln = lengths[b]
            np.testing.assert_allclose(got[b, :ln], want[:ln], rtol=1e-4, atol=1e-5)


def test_dense_transformer_conv_matches_oracle():
    rng = np.random.default_rng(1)
    B, L, D, Dout = 1, 5, 6, 4
    lengths = np.array([5])
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    adj = np.asarray(graphs.window_adjacency(lengths, L, 1, 2))

    mod = DenseTransformerConv(Dout)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(adj))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(adj)))[0]

    p = jax.tree_util.tree_map(np.asarray, params)
    q = x[0] @ p["lin_query"]["kernel"] + p["lin_query"]["bias"]
    k = x[0] @ p["lin_key"]["kernel"] + p["lin_key"]["bias"]
    v = x[0] @ p["lin_value"]["kernel"] + p["lin_value"]["bias"]
    skip = x[0] @ p["lin_skip"]["kernel"] + p["lin_skip"]["bias"]
    want = np.zeros((L, Dout), np.float32)
    for tgt in range(L):
        srcs = [u for u in range(L) if adj[0, u, tgt] > 0]
        scores = np.array([q[tgt] @ k[u] / np.sqrt(Dout) for u in srcs])
        alpha = np.exp(scores - scores.max())
        alpha = alpha / alpha.sum()
        want[tgt] = skip[tgt] + sum(a * v[u] for a, u in zip(alpha, srcs))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dense_graph_conv_matches_oracle():
    rng = np.random.default_rng(2)
    B, L, D, Dout = 1, 4, 3, 5
    lengths = np.array([4])
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    adj = np.asarray(graphs.window_adjacency(lengths, L, 1, 1))
    mod = DenseGraphConv(Dout)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(adj))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(adj)))[0]
    p = jax.tree_util.tree_map(np.asarray, params)
    want = np.zeros((L, Dout), np.float32)
    for v in range(L):
        agg = sum(x[0, u] for u in range(L) if adj[0, u, v] > 0)
        want[v] = (
            agg @ p["lin_rel"]["kernel"] + p["lin_rel"]["bias"]
            + x[0, v] @ p["lin_root"]["kernel"] + p["lin_root"]["bias"]
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gcnii_stack_matches_reference_math():
    """Oracle ports GraphConvolution.forward (mmgcn_models.py:27-39, variant=True)."""
    rng = np.random.default_rng(3)
    B, N, nh, layers = 1, 6, 8, 5
    lamda, alpha = 0.5, 0.1
    x = rng.normal(size=(B, N, nh)).astype(np.float32)
    adj = rng.uniform(0, 1, (B, N, N)).astype(np.float32)
    adj = (adj + adj.transpose(0, 2, 1)) / 2  # symmetric, like the normalized big-adj

    mod = GCNIIStack(nlayers=layers, nhidden=nh, lamda=lamda, alpha=alpha, dropout=0.0)
    params = mod.init(jax.random.PRNGKey(2), jnp.asarray(x), jnp.asarray(adj))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(adj)))[0]

    Ws = np.asarray(params["convs"])
    h0 = x[0]
    h = x[0]
    for l in range(1, layers + 1):
        theta = np.log(lamda / l + 1)
        hi = adj[0] @ h
        support = np.concatenate([hi, h0], -1)
        r = (1 - alpha) * hi + alpha * h0
        h = np.maximum(theta * (support @ Ws[l - 1]) + (1 - theta) * r, 0)
    np.testing.assert_allclose(got, h, rtol=1e-4, atol=1e-5)


def test_masked_batchnorm_matches_torch_flat():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    B, L, F = 3, 7, 5
    lengths = np.array([7, 4, 2])
    mask = (np.arange(L)[None] < lengths[:, None]).astype(np.float32)
    x = rng.normal(size=(B, L, F)).astype(np.float32)
    flat = np.concatenate([x[i, : lengths[i]] for i in range(B)])

    tbn = torch.nn.BatchNorm1d(F)
    tbn.train()
    with torch.no_grad():
        want_flat = tbn(torch.from_numpy(flat)).numpy()

    mod = MaskedBatchNorm(F)
    vars_ = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    got, new_vars = mod.apply(
        vars_, jnp.asarray(x), jnp.asarray(mask), mutable=["batch_stats"]
    )
    got = np.asarray(got)
    i0 = 0
    for i in range(B):
        np.testing.assert_allclose(
            got[i, : lengths[i]], want_flat[i0 : i0 + lengths[i]], rtol=1e-4, atol=1e-5
        )
        i0 += lengths[i]
    # running stats match torch's
    np.testing.assert_allclose(
        np.asarray(new_vars["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_vars["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-5,
    )


def test_dense_rgcn_with_bases_shapes():
    rng = np.random.default_rng(5)
    B, L, D, Dout, S = 2, 5, 4, 3, 2
    lengths = np.array([5, 3])
    spk = rng.integers(0, S, (B, L))
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    adj = jnp.asarray(np.asarray(graphs.window_adjacency(lengths, L, 2, 2)))
    rel = graphs.relation_ids(spk, S)
    mod = DenseRGCN(Dout, num_relations=2 * S * S, num_bases=3, aggr="add")
    params = mod.init(jax.random.PRNGKey(3), jnp.asarray(x), adj, rel)["params"]
    out = mod.apply({"params": params}, jnp.asarray(x), adj, rel)
    assert out.shape == (B, L, Dout)
    assert np.isfinite(np.asarray(out)).all()
