"""Gradient-level torch parity for the rest of the model zoo (VERDICT r2 #1).

test_model_torch_parity.py establishes forward+loss parity for all families
and gradient parity for COGMEN/DGCN; this file closes the net: MMGCN
(64-layer-GCNII VJP incl. the feature-dependent adjacency), DAG-ERC (fused
DAGStack scan VJP), dgcnv2/DialogueRNN (nested-scan VJP — forward parity
asserted here too, it had only smoke coverage), CIM, MMIN.

Pattern: init the flax model, port every weight into a torch leaf tensor
with requires_grad, rebuild the *reference* graph (track_mm/mmgcn_models.py,
dagerc.py, dgcnv2_models.py, cim.py, mmin_models.py semantics) from
differentiable torch ops, backprop the identical masked loss, and compare
dLoss/dParam leaf-by-leaf.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from test_model_torch_parity import (
    edge_perms,
    erc_batch,
    rel_id,
    t_,
    valid_rows,
)

torch.manual_seed(0)


class LeafStore:
    """Torch leaf tensors mirroring a flax param tree, keyed by path."""

    def __init__(self, params):
        self.p = params
        self.t = {}

    def __call__(self, *path):
        node = self.p
        for k in path:
            node = node[k]
        key = "/".join(path)
        if key not in self.t:
            self.t[key] = t_(node).requires_grad_()
        return self.t[key]

    def compare(self, jgrads, atol=3e-5, rtol=3e-4, min_checks=1):
        checks = 0

        def walk(node, path):
            nonlocal checks
            if isinstance(node, dict):
                for kk, vv in node.items():
                    walk(vv, path + (kk,))
                return
            key = "/".join(path)
            if key in self.t and self.t[key].grad is not None:
                np.testing.assert_allclose(
                    np.asarray(node), self.t[key].grad.numpy(),
                    atol=atol, rtol=rtol, err_msg=f"grad mismatch at {key}",
                )
                checks += 1

        walk(jgrads, ())
        assert checks >= min_checks, f"only {checks} leaves compared"
        return checks


def share_rnn(rnn_mod, leaf, path_prefix, layers=1, bidirectional=True):
    """Replace a torch RNN module's Parameters with shared leaf tensors so
    grads land on the LeafStore entries."""
    revs = ("", "_reverse") if bidirectional else ("",)
    for layer in range(layers):
        for rev in revs:
            for nm in ("w_ih", "w_hh", "b_ih", "b_hh"):
                tgt = f"{'weight' if nm.startswith('w') else 'bias'}_{nm[2:]}_l{layer}{rev}"
                src = leaf(*path_prefix, f"{nm}_l{layer}{rev}")
                delattr(rnn_mod, tgt)
                setattr(rnn_mod, tgt, src)


def gru_t(x, h, w_ih, w_hh, b_ih, b_hh):
    """torch GRUCell math from explicit leaves (differentiable)."""
    gi = x @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    ir, iz, inn = gi.chunk(3, -1)
    hr, hz, hn = gh.chunk(3, -1)
    r = torch.sigmoid(ir + hr)
    z = torch.sigmoid(iz + hz)
    n = torch.tanh(inn + r * hn)
    return (1 - z) * n + z * h


def flax_grads(model, variables, batch, loss_of_logits):
    import jax
    import jax.numpy as jnp  # noqa: F401

    def loss_fn(params):
        out = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            batch, deterministic=True,
        )
        return loss_of_logits(out)

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    return float(val), jax.tree_util.tree_map(np.asarray, grads)


def masked_ce_jnp(logits, batch, mask_key="attention_mask"):
    import jax.numpy as jnp

    from erc_tpu.train.trainer import masked_cross_entropy

    return masked_cross_entropy(
        logits, jnp.asarray(batch["label"]), jnp.asarray(batch[mask_key])
    )


# =================================================================== MMGCN
def test_mmgcn_grad_parity():
    """Gradients through linear/LSTM encoders, speaker embedding, the
    feature-dependent big adjacency (arccos similarity + degree norm) and
    the deep GCNII stack match torch autograd (mmgcn_models.py:8-39,
    344-394, 582-646).  Equal-length dialogues (unpacked-LSTM note in
    test_model_torch_parity.py)."""
    import jax

    from erc_tpu.models.mmgcn import MMGCNModule

    n_classes, S, nlayers, nh, n_dim = 4, 2, 6, 24, 200
    batch, samples = erc_batch(n_classes=n_classes, lens=(6, 6, 6))
    lens = [len(s["label"]) for s in samples]

    model = MMGCNModule(
        n_speakers=S, n_classes=n_classes, modals="atv", n_dim=n_dim,
        graph_hidden_size=nh, gcn_layers=nlayers, adj_impl="dense",
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True,
    )
    jloss, jgrads = flax_grads(model, variables, batch, lambda lg: masked_ce_jnp(lg, batch))
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    leaf = LeafStore(p)

    with torch.enable_grad():
        a = t_(batch["audio_feature"]) @ leaf("linear_a", "kernel") + leaf("linear_a", "bias")
        v = t_(batch["visual_feature"]) @ leaf("linear_v", "kernel") + leaf("linear_v", "bias")
        l0 = t_(batch["text_feature"]) @ leaf("linear_l", "kernel") + leaf("linear_l", "bias")
        lstm = torch.nn.LSTM(n_dim, 100, num_layers=2, bidirectional=True,
                             batch_first=True, dropout=0.0)
        share_rnn(lstm, leaf, ("lstm_l",), layers=2)
        l = lstm(l0)[0]  # unpacked (mmgcn.py:69,115); equal lengths
        spk = torch.from_numpy(np.asarray(batch["speaker_ids"])).long()
        l = l + leaf("speaker_embeddings", "embedding")[spk]

        fa = torch.cat([a[i, :ln] for i, ln in enumerate(lens)], 0)
        fv = torch.cat([v[i, :ln] for i, ln in enumerate(lens)], 0)
        fl = torch.cat([l[i, :ln] for i, ln in enumerate(lens)], 0)
        N = fa.shape[0]

        # create_big_adj (mmgcn_models.py:582-646) — differentiable
        feats = [fa, fv, fl]
        rows = []
        start = 0
        blocks = torch.zeros(3 * N, 3 * N)
        for ln in lens:
            for m in range(3):
                for n2 in range(3):
                    ms, ns = start + N * m, start + N * n2
                    if m == n2:
                        x = feats[m][start : start + ln]
                        xn = x / x.norm(dim=1, keepdim=True)
                        cs = (xn @ xn.T).clamp(-0.99999, 0.99999) * 0.99999
                        blocks = blocks.index_put(
                            (torch.arange(ms, ms + ln)[:, None], torch.arange(ns, ns + ln)[None, :]),
                            1 - torch.acos(cs) / np.pi,
                        )
                    else:
                        x1 = feats[m][start : start + ln]
                        x2 = feats[n2][start : start + ln]
                        cs = ((x1 / x1.norm(dim=1, keepdim=True))
                              * (x2 / x2.norm(dim=1, keepdim=True))).sum(1) * 0.99999
                        sim = 1 - torch.acos(cs) / np.pi
                        blocks = blocks.index_put(
                            (torch.arange(ms, ms + ln), torch.arange(ns, ns + ln)), sim
                        )
            start += ln
        d = blocks.sum(1)
        dinv = torch.where(d > 0, d.pow(-0.5), torch.zeros_like(d))
        adj = dinv[:, None] * blocks * dinv[None, :]

        x = torch.cat([fa, fv, fl], 0)
        h0 = torch.relu(x @ leaf("fc0", "kernel") + leaf("fc0", "bias"))
        Ws = leaf("gcnii", "convs")
        h = h0
        for i in range(nlayers):
            theta = np.log(0.5 / (i + 1) + 1)
            hi = adj @ h
            support = torch.cat([hi, h0], 1)
            r = 0.9 * hi + 0.1 * h0
            h = torch.relu(theta * (support @ Ws[i]) + (1 - theta) * r)
        h = torch.cat([x, h], -1)
        feat = torch.relu(torch.cat([h[:N], h[N : 2 * N], h[2 * N :]], -1))
        ref_logits = feat @ leaf("smax_fc", "kernel") + leaf("smax_fc", "bias")

        labels = valid_rows(np.asarray(batch["label"])[..., None], lens)[:, 0]
        loss = F.cross_entropy(ref_logits, torch.from_numpy(labels).long())
        assert jloss == pytest.approx(float(loss), abs=2e-4)
        loss.backward()

    # deep stacks accumulate fp error; rtol dominates for the big leaves
    leaf.compare(jgrads, atol=5e-5, rtol=1e-3, min_checks=25)


# ================================================================= DAG-ERC
def test_dagerc_grad_parity():
    """Gradients through the fused DAGStack lax.scan (per-layer GRU pairs +
    GAT gather, dagerc.py:156-198 / dagerc_models.py:312-365) match the
    per-dialogue torch loop."""
    import jax

    from erc_tpu.models.dagerc import DAGERCModule

    n_classes, layers, D, windowp = 4, 2, 12, 1
    batch, samples = erc_batch(n_classes=n_classes)
    lens = [len(s["label"]) for s in samples]
    Din = batch["input_tensor"].shape[-1]

    model = DAGERCModule(
        emb_dim=Din, n_classes=n_classes, gnn_layers=layers, hidden_dim=D,
        windowp=windowp, drop_rate=0.0,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True,
    )
    jloss, jgrads = flax_grads(model, variables, batch, lambda lg: masked_ce_jnp(lg, batch))
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    leaf = LeafStore(p)

    with torch.enable_grad():
        ref_rows = []
        for d, ln in enumerate(lens):
            spk = np.asarray(batch["speaker_ids"])[d][:ln]
            x = t_(np.asarray(batch["input_tensor"])[d, :ln])
            adj = torch.zeros(ln, ln)
            for i in range(ln):
                cnt = 0
                for j in range(i - 1, -1, -1):
                    adj[i, j] = 1
                    if spk[j] == spk[i]:
                        cnt += 1
                        if cnt == windowp:
                            break
            smask = torch.from_numpy((spk[:, None] == spk[None, :]).astype(np.float32))

            H0 = torch.relu(x @ leaf("fc1", "kernel") + leaf("fc1", "bias"))
            Hs = [H0]
            for lidx in range(layers):
                lp = lambda name: leaf("stack", f"layer_{lidx}_{name}")
                gc = lambda xx, hh: gru_t(
                    xx, hh, lp("gru_c_w_ih"), lp("gru_c_w_hh"),
                    lp("gru_c_b_ih"), lp("gru_c_b_hh"),
                )
                gp = lambda xx, hh: gru_t(
                    xx, hh, lp("gru_p_w_ih"), lp("gru_p_w_hh"),
                    lp("gru_p_b_ih"), lp("gru_p_b_hh"),
                )
                Hl = Hs[-1]
                C = gc(Hl[0:1], torch.zeros(1, D))
                P = gp(torch.zeros(1, D), Hl[0:1])
                H1 = C + P
                for i in range(1, ln):
                    Q = Hl[i : i + 1].expand(i, -1)
                    X = torch.cat([Q, H1], 1)
                    alpha = (X @ lp("att_w") + lp("att_b"))[:, 0]
                    alpha = alpha + (adj[i, :i] - 1) * 1e30
                    attn = torch.softmax(alpha, 0)
                    V0 = H1 @ lp("Wr0").T
                    V1 = H1 @ lp("Wr1").T
                    Vsel = V0 * smask[i, :i, None] + V1 * (1 - smask[i, :i, None])
                    M = (attn[:, None] * Vsel).sum(0, keepdim=True)
                    C = gc(Hl[i : i + 1], M)
                    P = gp(M, Hl[i : i + 1])
                    H1 = torch.cat([H1, C + P], 0)
                Hs.append(H1)
            H = torch.cat(Hs + [x], 1)
            h = torch.relu(H @ leaf("out_0", "kernel") + leaf("out_0", "bias"))
            h = torch.relu(h @ leaf("out_1", "kernel") + leaf("out_1", "bias"))
            ref_rows.append(h @ leaf("out_2", "kernel") + leaf("out_2", "bias"))
        ref_logits = torch.cat(ref_rows, 0)

        labels = valid_rows(np.asarray(batch["label"])[..., None], lens)[:, 0]
        loss = F.cross_entropy(ref_logits, torch.from_numpy(labels).long())
        assert jloss == pytest.approx(float(loss), abs=1e-4)
        loss.backward()

    leaf.compare(jgrads, atol=3e-5, rtol=3e-4, min_checks=30)


# ===================================================================== CIM
def test_cim_grad_parity():
    """Gradients through the packed biGRUs, relu adapters, six pairwise
    -10000-masked attention products and both heads of the CE+BCE multitask
    loss match torch autograd (cim.py:64-229)."""
    import jax
    import jax.numpy as jnp

    from erc_tpu.models.cim import CIMModule, masked_bce_with_logits

    n_classes, H = 2, 12
    batch, samples = erc_batch(n_classes=n_classes)
    lens = [len(s["label"]) for s in samples]
    mask = np.asarray(batch["attention_mask"])
    rng = np.random.default_rng(3)
    emo = (rng.random((mask.shape[0], mask.shape[1], 7)) < 0.4).astype(np.int32)

    model = CIMModule(
        text_dim=batch["text_feature"].shape[-1],
        audio_dim=batch["audio_feature"].shape[-1],
        visual_dim=batch["visual_feature"].shape[-1],
        hidden_size=H, n_classes=n_classes,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True,
    )

    def loss_of(out):
        lg2, lg7 = out
        return masked_ce_jnp(lg2, batch) + masked_bce_with_logits(
            lg7, jnp.asarray(emo, jnp.float32), jnp.asarray(mask)
        )

    jloss, jgrads = flax_grads(model, variables, batch, loss_of)
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    leaf = LeafStore(p)

    with torch.enable_grad():
        dense = {}
        for m, key in (("a", "audio_feature"), ("v", "visual_feature"), ("t", "text_feature")):
            x = t_(batch[key])
            gru = torch.nn.GRU(x.shape[-1], H, num_layers=1, bidirectional=True,
                               batch_first=True)
            share_rnn(gru, leaf, (f"rnn_{m}",), layers=1)
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                x, torch.tensor(lens), batch_first=True, enforce_sorted=False
            )
            h, _ = torch.nn.utils.rnn.pad_packed_sequence(
                gru(packed)[0], batch_first=True, total_length=x.shape[1]
            )
            dense[m] = torch.relu(
                h @ leaf(f"adapter_{m}", "kernel") + leaf(f"adapter_{m}", "bias")
            )

        tm = t_(mask)

        def att(x, y):
            s = x @ y.transpose(-1, -2) + (1.0 - tm[:, None, :]) * -10000.0
            return torch.softmax(s, -1) @ y * x

        a, v, t = dense["a"], dense["v"], dense["t"]
        merged = torch.cat(
            [att(a, v), att(v, a), att(t, a), att(t, v), att(a, t), att(v, t), a, v, t], -1
        )
        ref2 = merged @ leaf("cls2", "kernel") + leaf("cls2", "bias")
        ref7 = merged @ leaf("cls7", "kernel") + leaf("cls7", "bias")

        labels = valid_rows(np.asarray(batch["label"])[..., None], lens)[:, 0]
        r2 = torch.cat([ref2[i, :ln] for i, ln in enumerate(lens)], 0)
        r7 = torch.cat([ref7[i, :ln] for i, ln in enumerate(lens)], 0)
        e7 = t_(valid_rows(emo, lens).astype(np.float32))
        loss = F.cross_entropy(r2, torch.from_numpy(labels).long()) + \
            F.binary_cross_entropy_with_logits(r7, e7)
        assert jloss == pytest.approx(float(loss), abs=1e-4)
        loss.backward()

    leaf.compare(jgrads, atol=3e-5, rtol=3e-4, min_checks=20)


# ==================================================================== MMIN
def test_mmin_base_grad_parity():
    """Gradients through the unpacked LSTM+maxpool encoders, TextCNN and
    classifier match torch autograd (mmin_models.py:8-130); the EMA shadow
    is a stop-gradient side-channel and must contribute nothing."""
    import jax
    import jax.numpy as jnp

    from erc_tpu.data.mmin import MMINBatcher, synthetic_mmin
    from erc_tpu.models.mmin_models import MMINBaseModule
    from erc_tpu.train.trainer import masked_cross_entropy

    samples = synthetic_mmin(4, "train", n_train=5)
    batch = MMINBatcher(max_audio_len=16, has_miss=False, pad_batch_to=8)(samples)

    model = MMINBaseModule(n_classes=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True,
    )

    def loss_of(out):
        logits, _fusion = out
        return masked_cross_entropy(
            logits, jnp.asarray(batch["label"]), jnp.asarray(batch["sample_mask"])
        )

    jloss, jgrads = flax_grads(model, variables, batch, loss_of)
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    leaf = LeafStore(p)

    with torch.enable_grad():
        def lstm_maxpool(xkey, net):
            x = t_(batch[xkey])
            lstm = torch.nn.LSTM(x.shape[-1], 128, num_layers=1, batch_first=True)
            share_rnn(lstm, leaf, (net, "rnn"), layers=1, bidirectional=False)
            out, _ = lstm(x)
            return out.max(dim=1).values

        def textcnn(xkey, net):
            x = t_(batch[xkey])
            outs = []
            for k in (3, 4, 5):
                w = leaf(net, f"conv{k}", "kernel").permute(2, 0, 1).unsqueeze(1)
                b = leaf(net, f"conv{k}", "bias")
                c = F.relu(F.conv2d(x[:, None], w, b).squeeze(3))
                outs.append(F.max_pool1d(c, c.shape[2]).squeeze(2))
            h = torch.cat(outs, 1)
            return F.relu(h @ leaf(net, "embd", "kernel") + leaf(net, "embd", "bias"))

        feats = torch.cat(
            [
                lstm_maxpool("audio_feature", "netA"),
                lstm_maxpool("visual_feature", "netV"),
                textcnn("text_feature", "netL"),
            ],
            -1,
        )
        h = feats
        for i in range(2):
            h = torch.relu(h @ leaf("netC", f"fc{i}", "kernel") + leaf("netC", f"fc{i}", "bias"))
        ref_logits = h @ leaf("netC", "fc_out", "kernel") + leaf("netC", "fc_out", "bias")

        sel = np.asarray(batch["sample_mask"]) > 0
        loss = F.cross_entropy(
            ref_logits[torch.from_numpy(sel)],
            torch.from_numpy(np.asarray(batch["label"])[sel]).long(),
        )
        assert jloss == pytest.approx(float(loss), abs=1e-4)
        loss.backward()

    leaf.compare(jgrads, atol=3e-5, rtol=3e-4, min_checks=15)


# ==================================================== dgcnv2 / DialogueRNN
def test_dgcnv2_dialoguernn_forward_and_grad_parity():
    """dgcnv2 with the DialogueRNN base encoder: forward logits AND
    gradients match a per-dialogue torch replica of the reference
    (DialogueRNNCell dgcnv2_models.py:235-347 with 'general' matching
    attention, MaskedEdgeAttention 'attn1' :517-562, GraphNetwork :753-773,
    matchatt 'general2' + classifier :693-750).  This was the one family
    with smoke-only coverage (VERDICT r2 #1)."""
    import jax

    from erc_tpu.models.dgcnv2 import DGCNV2Module

    n_classes, S, wp, wf = 4, 2, 2, 2
    hidden = 10  # D_e; emotions dim = 2*hidden
    d_g = d_p = 8
    gh = 12  # graph_hidden_size
    batch, samples = erc_batch(n_classes=n_classes)
    lens = [len(s["label"]) for s in samples]
    L = np.asarray(batch["attention_mask"]).shape[1]
    Din = batch["input_tensor"].shape[-1]

    model = DGCNV2Module(
        base_model="DialogRNN", input_size=Din, hidden_size=hidden,
        n_speakers=S, wp=wp, wf=wf, n_classes=n_classes, max_seq_len=L,
        graph_hidden_size=gh, d_g=d_g, d_p=d_p,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True,
    )
    logits = np.asarray(model.apply(variables, batch, deterministic=True))
    jloss, jgrads = flax_grads(model, variables, batch, lambda lg: masked_ce_jnp(lg, batch))
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    leaf = LeafStore(p)

    def drnn(prefix, U, qm):
        """DialogueRNN over one dialogue (valid prefix only). U [ln, Dm],
        qm [ln, P] one-hot → [ln, D_e]."""
        ln, P = qm.shape
        cell = lambda tag, x, h: gru_t(
            x, h, leaf(prefix, f"{tag}_w_ih"), leaf(prefix, f"{tag}_w_hh"),
            leaf(prefix, f"{tag}_b_ih"), leaf(prefix, f"{tag}_b_hh"),
        )
        g_hist = []
        g_prev = torch.zeros(1, d_g)
        q = torch.zeros(P, d_p)
        e_prev = torch.zeros(1, hidden)
        es = []
        for t in range(ln):
            u = U[t : t + 1]
            qmt = qm[t]
            idx = int(qmt.argmax())
            g_ = cell("g_cell", torch.cat([u, q[idx : idx + 1]], 1), g_prev)
            if t == 0:
                c = torch.zeros(1, d_g)
            else:
                M = torch.cat(g_hist, 0)  # [t, D_g]
                xq = u @ leaf(prefix, "att_transform").T  # [1, D_g]
                alpha = torch.softmax(xq @ M.T, -1)
                c = alpha @ M
            uc = torch.cat([u, c], 1)
            qs = cell("p_cell", uc.expand(P, -1), q)
            q = q * (1 - qmt[:, None]) + qs * qmt[:, None]
            e_ = cell("e_cell", q[idx : idx + 1], e_prev)
            g_hist.append(g_)
            g_prev, e_prev = g_, e_
            es.append(e_)
        return torch.cat(es, 0)

    with torch.enable_grad():
        spk_all = np.asarray(batch["speaker_ids"])
        em_list = []
        for d, ln in enumerate(lens):
            U = t_(np.asarray(batch["input_tensor"])[d, :ln])
            qm = torch.from_numpy(
                np.eye(S, dtype=np.float32)[spk_all[d, :ln]]
            )
            f = drnn("dialog_rnn_f", U, qm)
            b = drnn("dialog_rnn_r", torch.flip(U, [0]), torch.flip(qm, [0]))
            b = torch.flip(b, [0])
            em_list.append(torch.cat([f, b], -1))  # [ln, 2*hidden]

        # MaskedEdgeAttention 'attn1': alpha[u, v] = softmax_v∈win(u) W[u]·em_v
        W_sc = leaf("att_model", "scalar")
        edges, rels, norm_vals = [], [], []
        off = 0
        for d, ln in enumerate(lens):
            emd = em_list[d]
            wx = W_sc[:ln] @ emd.T  # [ln(u), ln(v)]
            for u in range(ln):
                lo, hi = max(0, u - wp), min(ln - 1, u + wf)
                probs = torch.softmax(wx[u, lo : hi + 1], 0)
                row = {v: probs[v - lo] for v in range(lo, hi + 1)}
                spk = spk_all[d]
                for u2, v in edge_perms(ln, wp, wf):
                    if u2 == u:
                        edges.append((u + off, v + off))
                        rels.append(rel_id(spk[u], spk[v], u, v, S))
                        norm_vals.append(row[v])
            off += ln

        em_flat = torch.cat(em_list, 0)
        N = em_flat.shape[0]
        Wr = torch.einsum("rb,bde->rde", leaf("conv1", "att"), leaf("conv1", "basis"))
        g = em_flat @ leaf("conv1", "root") + leaf("conv1", "bias")
        for (u, v), r, nr in zip(edges, rels, norm_vals):
            g = g.index_add(0, torch.tensor([v]), (nr * (em_flat[u] @ Wr[r]))[None])

        agg = torch.zeros(N, gh)
        for u, v in edges:
            agg = agg.index_add(0, torch.tensor([v]), g[u][None])
        g2 = (
            agg @ leaf("conv2", "lin_rel", "kernel") + leaf("conv2", "lin_rel", "bias")
            + g @ leaf("conv2", "lin_root", "kernel") + leaf("conv2", "lin_root", "bias")
        )

        em2 = torch.cat([em_flat, g2], -1)
        # matchatt 'general2' per dialogue over valid nodes
        rows = []
        off = 0
        for d, ln in enumerate(lens):
            emd = em2[off : off + ln]
            xq = emd @ leaf("matchatt_w").T + leaf("matchatt_b")
            scores = torch.tanh(xq @ emd.T)
            alpha = torch.softmax(scores, -1)
            rows.append(alpha @ emd)
            off += ln
        att_em = torch.cat(rows, 0)
        h = torch.relu(att_em @ leaf("linear", "kernel") + leaf("linear", "bias"))
        ref_logits = h @ leaf("smax_fc", "kernel") + leaf("smax_fc", "bias")

        got = valid_rows(logits, lens)
        np.testing.assert_allclose(
            got, ref_logits.detach().numpy(), atol=1e-4, rtol=1e-4
        )

        labels = valid_rows(np.asarray(batch["label"])[..., None], lens)[:, 0]
        loss = F.cross_entropy(ref_logits, torch.from_numpy(labels).long())
        assert jloss == pytest.approx(float(loss.detach()), abs=1e-4)
        loss.backward()

    leaf.compare(jgrads, atol=5e-5, rtol=5e-4, min_checks=35)
