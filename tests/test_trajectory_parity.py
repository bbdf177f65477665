"""K-step optimizer-trajectory parity vs torch (VERDICT r2 #1b).

Gradient parity (test_model_torch_parity.py, test_grad_parity_zoo.py) pins
dLoss/dParam at one point; these tests run FIVE full optimization steps on
the real models and assert the parameters land where torch's optimizers put
them — catching eps/wd-placement/bias-correction/clip-ordering drift that
single-step checks cannot see.

Configs under test (the reference's):
  - COGMEN: torch.optim.Adam(lr=1e-4, weight_decay=1e-8) — L2 folded into
    the gradient before moments (cogmen.py:38-42)
  - DAG-ERC: AdamW + clip_grad_norm_(5.0) before the step (dagerc.py:230)
  - split_wd: Adam with the 'bn'-param-group wd=0 split
    (contrib/make_optim.py:4-17), wd=1e-2 so placement actually matters
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from test_grad_parity_zoo import LeafStore, gru_t
from test_model_torch_parity import edge_perms, erc_batch, rel_id, t_, valid_rows

torch.manual_seed(0)

K_STEPS = 5


# ---------------------------------------------------------- torch replicas
def cogmen_ref_loss(leaf, batch, lens, S, wp, wf):
    """Differentiable torch replica of COGMEN encoder_mode='reference'
    (cogmen.py:61-74,138-160); dense-mask formulation of the same math as
    test_model_torch_parity.test_cogmen_grad_parity."""
    x = t_(valid_rows(batch["input_tensor"], lens))
    h = x @ leaf("transformer_out", "kernel") + leaf("transformer_out", "bias")
    n = h.shape[0]
    R = 2 * S * S

    edges, rels = [], []
    off = 0
    for d, ln in enumerate(lens):
        spk = np.asarray(batch["speaker_ids"])[d]
        for u, v in edge_perms(ln, wp, wf):
            edges.append((u + off, v + off))
            rels.append(rel_id(spk[u], spk[v], u, v, S))
        off += ln
    A = torch.zeros(R, n, n)  # A[r, u, v] — constant, rebuilt cheaply
    for (u, v), r in zip(edges, rels):
        A[r, u, v] = 1.0

    W = leaf("gcn", "conv1", "weight")
    g = h @ leaf("gcn", "conv1", "root") + leaf("gcn", "conv1", "bias")
    cnt = A.sum(1).clamp(min=1.0)  # [R, v]
    for r in range(R):
        g = g + (A[r].T @ (h @ W[r])) / cnt[r][:, None]

    q = g @ leaf("gcn", "conv2", "lin_query", "kernel") + leaf("gcn", "conv2", "lin_query", "bias")
    k = g @ leaf("gcn", "conv2", "lin_key", "kernel") + leaf("gcn", "conv2", "lin_key", "bias")
    v_ = g @ leaf("gcn", "conv2", "lin_value", "kernel") + leaf("gcn", "conv2", "lin_value", "bias")
    skip = g @ leaf("gcn", "conv2", "lin_skip", "kernel") + leaf("gcn", "conv2", "lin_skip", "bias")
    d_ = q.shape[-1]
    mask_in = (A.sum(0) > 0).T  # [v, u]: incoming edges of v
    scores = (q @ k.T) / np.sqrt(d_)
    scores = scores.masked_fill(~mask_in, -1e30)
    alpha = torch.softmax(scores, -1) * mask_in
    g2 = skip + alpha @ v_
    g2 = g2 / np.sqrt(1.0 + 1e-5) * leaf("gcn", "bn", "scale") + leaf("gcn", "bn", "bias")
    g2 = F.leaky_relu(g2, 0.01)
    out = torch.relu(g2 @ leaf("cls_0", "kernel") + leaf("cls_0", "bias"))
    logits = out @ leaf("cls_1", "kernel") + leaf("cls_1", "bias")

    labels = valid_rows(np.asarray(batch["label"])[..., None], lens)[:, 0]
    return F.cross_entropy(logits, torch.from_numpy(labels).long())


def dagerc_ref_loss(leaf, batch, lens, layers, D, windowp):
    """Differentiable per-dialogue torch replica of DAG-ERC
    (dagerc.py:156-198 / dagerc_models.py:312-365) — same math as
    test_grad_parity_zoo.test_dagerc_grad_parity."""
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
                xx, hh, lp("gru_c_w_ih"), lp("gru_c_w_hh"), lp("gru_c_b_ih"), lp("gru_c_b_hh")
            )
            gp = lambda xx, hh: gru_t(
                xx, hh, lp("gru_p_w_ih"), lp("gru_p_w_hh"), lp("gru_p_b_ih"), lp("gru_p_b_hh")
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
    logits = torch.cat(ref_rows, 0)
    labels = valid_rows(np.asarray(batch["label"])[..., None], lens)[:, 0]
    return F.cross_entropy(logits, torch.from_numpy(labels).long())


# ------------------------------------------------------------------ driver
def run_trajectory(model, variables, batch, tx, leaf, torch_loss_fn, torch_opt,
                   clip_norm=None, k_steps=K_STEPS):
    """Step both sides K times from identical weights; return (flax_params,
    initial_params).  Torch leaves update in place inside `leaf`."""
    import jax
    import jax.numpy as jnp

    from erc_tpu.train.trainer import masked_cross_entropy

    def loss_fn(params):
        logits = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            batch, deterministic=True,
        )
        if isinstance(logits, tuple):
            logits = logits[0]
        return masked_cross_entropy(
            logits, jnp.asarray(batch["label"]), jnp.asarray(batch["attention_mask"])
        )

    import optax

    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss_fn)(p)
        updates, s2 = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s2

    init_params = jax.tree_util.tree_map(np.asarray, params)
    dead_leaves = set()

    for k in range(k_steps):
        params, opt_state = step(params, opt_state)

        with torch.enable_grad():
            loss = torch_loss_fn(leaf)
            torch_opt.zero_grad()
            loss.backward()
            if k == 0:
                # leaves whose true gradient is ~0 (e.g. lin_key bias: a
                # softmax is invariant to a per-target constant key shift)
                # get pure-float-noise grads that Adam normalizes to
                # full-size steps in framework-dependent directions —
                # excluded from the trajectory comparison
                for key, tensor in leaf.t.items():
                    g = tensor.grad
                    if g is None or float(g.abs().max()) < 1e-6:
                        dead_leaves.add(key)
            if clip_norm is not None:
                torch.nn.utils.clip_grad_norm_(
                    [t for t in leaf.t.values()], clip_norm
                )
            torch_opt.step()

    return jax.tree_util.tree_map(np.asarray, params), init_params, dead_leaves


def assert_trajectories_match(final_flax, init_params, leaf, dead_leaves=(),
                              atol=1e-6, rel_motion=0.05, min_checks=8,
                              min_motion=1e-5):
    """Final params equal leaf-by-leaf within atol + rel_motion·(how far the
    leaf moved) — grads only match to ~1e-5 absolute (different float
    summation orders), and Adam turns relative grad error into proportional
    trajectory error, so tolerance must scale with motion.  Semantic
    optimizer bugs (wd placement, bias correction, clip ordering) shift
    trajectories by 10-100% of motion and still fail loudly.  Also asserts
    the test has teeth: parameters moved far beyond the tolerance."""
    checks, motion = 0, 0.0

    def walk(node, init, path):
        nonlocal checks, motion
        if isinstance(node, dict):
            for kk in node:
                walk(node[kk], init[kk], path + (kk,))
            return
        key = "/".join(path)
        if key in leaf.t and key not in dead_leaves:
            got = leaf.t[key].detach().numpy()
            node = np.asarray(node)
            leaf_motion = float(np.abs(node - init).max())
            np.testing.assert_allclose(
                node, got, atol=atol + rel_motion * leaf_motion, rtol=0,
                err_msg=f"trajectory mismatch at {key}",
            )
            motion = max(motion, leaf_motion)
            checks += 1

    walk(final_flax, init_params, ())
    assert checks >= min_checks, checks
    assert motion > min_motion, f"params barely moved ({motion}); test is toothless"


def _cogmen_setup(optim_cfg, seed=0):
    import jax

    from erc_tpu.models.cogmen import COGMENModule
    from erc_tpu.train import optim as optim_factory

    n_classes, S, wp, wf = 4, 2, 5, 5
    batch, samples = erc_batch(n_classes=n_classes)
    lens = [len(s["label"]) for s in samples]
    Din = batch["input_tensor"].shape[-1]
    model = COGMENModule(
        input_size=Din, hidden_size=16, num_head=17, n_speakers=S,
        n_classes=n_classes, wp=wp, wf=wf, graph_impl="dense",
        encoder_mode="reference",
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True,
    )
    tx = optim_factory.build_optim(optim_cfg)
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    leaf = LeafStore(p)
    # materialize every replica leaf once so the torch optimizer sees them
    with torch.enable_grad():
        cogmen_ref_loss(leaf, batch, lens, S, wp, wf)
    loss_fn = lambda lf: cogmen_ref_loss(lf, batch, lens, S, wp, wf)
    return model, variables, batch, tx, leaf, loss_fn


def test_cogmen_adam_trajectory():
    """5 Adam(1e-4, wd=1e-8) steps land on torch.optim.Adam exactly
    (cogmen.py:38-42; L2-into-grad semantics, bias correction, eps)."""
    from erc_tpu.train import optim as optim_factory

    cfg = optim_factory.create_optim("Adam", lr=1e-4, weight_decay=1e-8)
    model, variables, batch, tx, leaf, loss_fn = _cogmen_setup(cfg)
    opt = torch.optim.Adam(list(leaf.t.values()), lr=1e-4, weight_decay=1e-8)
    final, init, dead = run_trajectory(model, variables, batch, tx, leaf, loss_fn, opt)
    assert_trajectories_match(final, init, leaf, dead, min_checks=12, min_motion=2e-4)


def test_cogmen_split_wd_trajectory():
    """5 Adam(1e-3, wd=1e-2, split_wd) steps: 'bn' params get wd=0, all
    others (incl. biases) decay — matching make_optim.py:4-17 exactly."""
    from erc_tpu.train import optim as optim_factory

    cfg = optim_factory.create_optim(
        "Adam", lr=1e-3, weight_decay=1e-2, split_wd=True
    )
    model, variables, batch, tx, leaf, loss_fn = _cogmen_setup(cfg)
    bn, rest = [], []
    for key, tensor in leaf.t.items():
        (bn if "bn" in key.lower() else rest).append(tensor)
    assert bn, "replica must include BN params for the split to have teeth"
    opt = torch.optim.Adam(
        [{"params": rest}, {"params": bn, "weight_decay": 0.0}],
        lr=1e-3, weight_decay=1e-2,
    )
    final, init, dead = run_trajectory(model, variables, batch, tx, leaf, loss_fn, opt)
    assert_trajectories_match(final, init, leaf, dead, min_checks=12, min_motion=1e-3)


def test_dagerc_adamw_clip_trajectory():
    """5 AdamW(1e-3)+clip_grad_norm_(5.0) steps land on torch exactly —
    decoupled decay and clip-before-step ordering (dagerc.py:230)."""
    import jax

    from erc_tpu.models.dagerc import DAGERCModule
    from erc_tpu.train import optim as optim_factory

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
    cfg = optim_factory.create_optim("AdamW", lr=1e-3, weight_decay=1e-2)
    tx = optim_factory.build_optim(cfg, grad_clip_norm=5.0)
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    leaf = LeafStore(p)
    with torch.enable_grad():
        dagerc_ref_loss(leaf, batch, lens, layers, D, windowp)
    opt = torch.optim.AdamW(list(leaf.t.values()), lr=1e-3, weight_decay=1e-2)
    loss_fn = lambda lf: dagerc_ref_loss(lf, batch, lens, layers, D, windowp)
    final, init, dead = run_trajectory(
        model, variables, batch, tx, leaf, loss_fn, opt, clip_norm=5.0
    )
    assert_trajectories_match(
        final, init, leaf, dead, atol=2e-6, min_checks=30, min_motion=1e-3
    )
