"""DAG-ERC layer parity: the incremental-scan DAGLayer vs a direct numpy
port of the reference recurrence (dagerc.py:167-188 + GAT_dialoggcn_v1
dagerc_models.py:326-365)."""

import numpy as np

import jax
import jax.numpy as jnp

from erc_tpu.models.dagerc import DAGLayer
from erc_tpu.ops import graphs


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_gru(x, h, w_ih, w_hh, b_ih, b_hh):
    gi = x @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    ir, iz, in_ = np.split(gi, 3, -1)
    hr, hz, hn = np.split(gh, 3, -1)
    r = np_sigmoid(ir + hr)
    z = np_sigmoid(iz + hz)
    n = np.tanh(in_ + r * hn)
    return (1 - z) * n + z * h


def reference_dag_layer(H, adj, s_mask, p):
    """Loop port of the reference layer (H: [B, L, D])."""
    B, L, D = H.shape
    att_w, att_b = p["att_w"], p["att_b"]
    wr0, wr1 = p["Wr0"], p["Wr1"]

    def gat(Q, K, V, adj_row, sm_row):
        # Q: [B, D]; K,V: [B, N, D]; adj_row/sm_row: [B, N]
        N = K.shape[1]
        Qe = np.repeat(Q[:, None, :], N, 1)
        X = np.concatenate([Qe, K], -1)
        alpha = (X @ att_w)[..., 0] + att_b[0]  # [B, N]
        alpha = alpha - (1 - adj_row) * 1e30
        e = np.exp(alpha - alpha.max(-1, keepdims=True))
        attn = e / e.sum(-1, keepdims=True)
        V0 = V @ wr0.T
        V1 = V @ wr1.T
        Vsel = V0 * sm_row[..., None] + V1 * (1 - sm_row[..., None])
        return np.einsum("bn,bnd->bd", attn, Vsel)

    C = np_gru(H[:, 0], np.zeros((B, D), np.float32), p["gru_c_w_ih"], p["gru_c_w_hh"], p["gru_c_b_ih"], p["gru_c_b_hh"])
    M0 = np.zeros((B, D), np.float32)
    P = np_gru(M0, H[:, 0], p["gru_p_w_ih"], p["gru_p_w_hh"], p["gru_p_b_ih"], p["gru_p_b_hh"])
    H1 = (C + P)[:, None, :]
    for i in range(1, L):
        M = gat(H[:, i], H1, H1, adj[:, i, :i], s_mask[:, i, :i])
        C = np_gru(H[:, i], M, p["gru_c_w_ih"], p["gru_c_w_hh"], p["gru_c_b_ih"], p["gru_c_b_hh"])
        P = np_gru(M, H[:, i], p["gru_p_w_ih"], p["gru_p_w_hh"], p["gru_p_b_ih"], p["gru_p_b_hh"])
        H1 = np.concatenate([H1, (C + P)[:, None, :]], 1)
    return H1


def test_dag_layer_matches_reference_loop():
    rng = np.random.default_rng(0)
    B, L, D = 2, 9, 12
    lengths = np.array([9, 5])
    spk = rng.integers(0, 2, (B, L))
    H = rng.normal(size=(B, L, D)).astype(np.float32)

    adj = np.asarray(graphs.dag_adjacency(spk, lengths, L, 1))
    s_mask = np.asarray(graphs.same_speaker_mask(spk))

    mod = DAGLayer(hidden_dim=D)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(H), jnp.asarray(adj), jnp.asarray(s_mask))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(H), jnp.asarray(adj), jnp.asarray(s_mask)))

    p = jax.tree_util.tree_map(np.asarray, dict(params))
    want = reference_dag_layer(H, adj, s_mask, p)
    for b, ln in enumerate(lengths):
        np.testing.assert_allclose(got[b, :ln], want[b, :ln], rtol=1e-4, atol=1e-5)


def test_dagerc_fused_matches_layered():
    """DAGStack (one pipelined scan) ≡ sequential DAGLayer applications."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from erc_tpu.models.dagerc import DAGERCModule

    rng = np.random.default_rng(0)
    B, L, Din, D, layers = 3, 9, 11, 8, 3
    lens = [9, 5, 7]
    mask = np.zeros((B, L), np.float32)
    for i, ln in enumerate(lens):
        mask[i, :ln] = 1
    batch = {
        "input_tensor": rng.normal(size=(B, L, Din)).astype(np.float32),
        "attention_mask": mask,
        "speaker_ids": rng.integers(0, 2, size=(B, L)).astype(np.int32),
        "text_length": np.array(lens, np.int32),
        "label": rng.integers(0, 4, size=(B, L)).astype(np.int32),
    }
    kw = dict(emb_dim=Din, n_classes=4, gnn_layers=layers, hidden_dim=D,
              windowp=1, drop_rate=0.0)
    mf = DAGERCModule(fused=True, **kw)
    vf = mf.init({"params": jax.random.PRNGKey(0)}, batch, deterministic=True)
    out_f = np.asarray(mf.apply(vf, batch, deterministic=True))

    # remap fused param names (stack/layer_{l}_<p>) → layered (layer_{l}/<p>)
    pf = vf["params"]
    pl = {k: v for k, v in pf.items() if k != "stack"}
    for l in range(layers):
        pl[f"layer_{l}"] = {
            name: pf["stack"][f"layer_{l}_{name}"]
            for name in (
                "att_w", "att_b", "Wr0", "Wr1",
                "gru_c_w_ih", "gru_c_w_hh", "gru_c_b_ih", "gru_c_b_hh",
                "gru_p_w_ih", "gru_p_w_hh", "gru_p_b_ih", "gru_p_b_hh",
            )
        }
    ml = DAGERCModule(fused=False, **kw)
    out_l = np.asarray(ml.apply({"params": pl}, batch, deterministic=True))
    np.testing.assert_allclose(out_f, out_l, atol=1e-5, rtol=1e-5)
