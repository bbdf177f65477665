"""FULL-training-run torch equivalence (VERDICT r3 item 1a).

The 5-step trajectory tests (test_trajectory_parity.py) pin optimizer
semantics; these run a complete training protocol — multiple epochs over
multiple batches in a fixed order, per-epoch eval, ReduceLROnPlateau on
the eval loss, LR injection — on BOTH stacks (jax model vs the
differentiable plain-torch replica of the reference semantics) and assert
they land on the same final losses, eval NLL, predictions, and LR.  This
is the strongest wF1-parity substitute available without the licensed
feature dumps.

Also differentially tests the host-side ReduceLROnPlateau against
torch.optim.lr_scheduler.ReduceLROnPlateau on shared metric streams
(the reference constructs it with torch defaults, dagerc.py:212).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from test_grad_parity_zoo import LeafStore
from test_model_torch_parity import t_, valid_rows
from test_trajectory_parity import cogmen_ref_loss, dagerc_ref_loss

torch.manual_seed(0)

N_EPOCHS = 12
N_BATCHES = 6  # steps = N_EPOCHS * N_BATCHES


# ------------------------------------------------------------ learnable data
def proto_batches(n_classes=4, dims=(7, 9, 11), lens=(5, 8, 3), n_batches=6,
                  seed=0, noise=1.5):
    """Batches with class-prototype features so the loss actually falls and
    plateau decisions are robust; fixed lens → one jit compilation."""
    from erc_tpu.data.collate import ERCBatcher

    da, dt, dv = dims
    proto_rng = np.random.default_rng(seed + 999)
    protos = {
        "audio": proto_rng.normal(size=(n_classes, da)).astype(np.float32),
        "text": proto_rng.normal(size=(n_classes, dt)).astype(np.float32),
        "visual": proto_rng.normal(size=(n_classes, dv)).astype(np.float32),
    }
    batcher = ERCBatcher(
        modality="atv", n_classes=n_classes, n_speakers=2, bucket=0,
        max_len=max(lens),
    )
    out = []
    for b in range(n_batches):
        rng = np.random.default_rng(seed + b)
        samples = []
        for ln in lens:
            label = rng.integers(0, n_classes, size=ln)
            samples.append(
                {
                    "audio": (protos["audio"][label]
                              + noise * rng.normal(size=(ln, da))).astype(np.float32),
                    "text": (protos["text"][label]
                             + noise * rng.normal(size=(ln, dt))).astype(np.float32),
                    "visual": (protos["visual"][label]
                               + noise * rng.normal(size=(ln, dv))).astype(np.float32),
                    "label": label.tolist(),
                    "speakers": rng.integers(0, 2, size=ln).tolist(),
                }
            )
        out.append((batcher(samples), [len(s["label"]) for s in samples]))
    return out


# ------------------------------------------------------------- run harness
def run_full_training(model, variables, tx, train_batches, eval_batch, leaf,
                      torch_loss_fn, torch_opt, clip_norm=None,
                      plateau_kw=None, jax_loss_fn=None, pred_logits_fn=None,
                      n_epochs=N_EPOCHS):
    """Run the SAME training protocol on both stacks; returns per-side
    histories.  torch_loss_fn(leaf, batch, lens) must be differentiable.
    jax_loss_fn(params, batch) overrides the default masked-CE loss for
    multi-output/multitask models (CIM); pred_logits_fn(params, batch)
    supplies the logits used for the final prediction-agreement check."""
    from erc_tpu.train import optim as optim_factory
    from erc_tpu.train.trainer import masked_cross_entropy

    if jax_loss_fn is None:
        def jax_loss_fn(params, batch):
            logits = model.apply({**variables, "params": params}, batch,
                                 deterministic=True)
            return masked_cross_entropy(
                logits, jnp.asarray(batch["label"]),
                jnp.asarray(batch["attention_mask"])
            )
    if pred_logits_fn is None:
        def pred_logits_fn(params, batch):
            return model.apply({**variables, "params": params}, batch,
                               deterministic=True)
    jax_loss = jax_loss_fn

    @jax.jit
    def jstep(params, opt_state, batch):
        loss, g = jax.value_and_grad(jax_loss)(params, batch)
        updates, s2 = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), s2, loss

    @jax.jit
    def jeval(params, batch):
        return jax_loss(params, batch), pred_logits_fn(params, batch)

    params = variables["params"]
    opt_state = tx.init(params)

    # patience=0 + 1% threshold: fires as soon as per-epoch improvement
    # drops below 1% — guaranteed within a short converging run, so the
    # decision-equivalence assertion actually gets exercised
    pk = dict(mode="min", factor=0.5, patience=0, threshold=1e-2)
    pk.update(plateau_kw or {})
    sched_j = optim_factory.ReduceLROnPlateau(**pk)
    sched_t = optim_factory.ReduceLROnPlateau(**pk)  # same policy, own stream

    eval_b, eval_lens = eval_batch
    hist = {"j_loss": [], "t_loss": [], "j_eval": [], "t_eval": [],
            "j_lr": [], "t_lr": []}

    for _ in range(n_epochs):
        for batch, lens in train_batches:
            params, opt_state, jl = jstep(params, opt_state, batch)
            hist["j_loss"].append(float(jl))

            with torch.enable_grad():
                tl = torch_loss_fn(leaf, batch, lens)
                torch_opt.zero_grad()
                tl.backward()
                if clip_norm is not None:
                    torch.nn.utils.clip_grad_norm_(list(leaf.t.values()), clip_norm)
                torch_opt.step()
            hist["t_loss"].append(float(tl))

        # per-epoch eval + plateau on the eval loss (reference cadence)
        j_nll, _ = jeval(params, eval_b)
        j_nll = float(j_nll)
        with torch.no_grad():
            t_nll = float(torch_loss_fn(leaf, eval_b, eval_lens))
        hist["j_eval"].append(j_nll)
        hist["t_eval"].append(t_nll)

        lr_j = optim_factory.get_learning_rate(opt_state)
        new_j = sched_j.step(j_nll, lr_j)
        if new_j != lr_j:
            opt_state = optim_factory.set_learning_rate(opt_state, new_j)
        lr_t = torch_opt.param_groups[0]["lr"]
        new_t = sched_t.step(t_nll, lr_t)
        for gname in torch_opt.param_groups:
            gname["lr"] = new_t
        hist["j_lr"].append(float(new_j))
        hist["t_lr"].append(float(new_t))

    # final predictions on the eval batch, both sides
    _, j_logits = jeval(params, eval_b)
    j_pred = np.argmax(valid_rows(np.asarray(j_logits), eval_lens), -1)
    return hist, params, j_pred


def assert_runs_equivalent(hist, j_pred, t_pred, loss_rtol=0.05,
                           agree_floor=0.9):
    j, t = np.asarray(hist["j_loss"]), np.asarray(hist["t_loss"])
    # early steps are near-exact; end-of-run within loss_rtol
    np.testing.assert_allclose(j[:3], t[:3], rtol=1e-3)
    np.testing.assert_allclose(j[-3:].mean(), t[-3:].mean(), rtol=loss_rtol)
    # training actually progressed (the test has teeth)
    assert j[-3:].mean() < 0.7 * j[:3].mean(), (j[:3], j[-3:])
    np.testing.assert_allclose(hist["j_eval"][-1], hist["t_eval"][-1],
                               rtol=loss_rtol)
    # plateau decisions matched step for step (jax lr is f32, torch f64)
    np.testing.assert_allclose(hist["j_lr"], hist["t_lr"], rtol=1e-5,
                               err_msg="plateau decisions diverged")
    assert hist["j_lr"][-1] < 0.9 * hist["j_lr"][0], (
        "plateau never fired; decision equivalence untested", hist["j_lr"]
    )
    agree = float(np.mean(j_pred == t_pred))
    assert agree >= agree_floor, f"prediction agreement {agree}"


# ------------------------------------------------------------------- tests
@pytest.mark.slow
def test_plateau_matches_torch_scheduler():
    """Host-side ReduceLROnPlateau == torch's on shared metric streams,
    including threshold-rel semantics, cooldown, and the eps guard."""
    from erc_tpu.train import optim as optim_factory

    rng = np.random.default_rng(0)
    for cfg in (dict(), dict(factor=0.5, patience=2),
                dict(patience=0, cooldown=2), dict(threshold=1e-2),
                dict(min_lr=1e-4, factor=0.01)):
        metrics = np.concatenate([
            np.linspace(2.0, 0.6, 8),           # clean descent
            0.6 + 0.001 * rng.random(10),        # hovering (sub-threshold)
            np.linspace(0.6, 0.59, 5),           # tiny improvements
        ])
        mine = optim_factory.ReduceLROnPlateau(mode="min", **cfg)
        p = torch.nn.Parameter(torch.zeros(1))
        topt = torch.optim.SGD([p], lr=0.1)
        tsch = torch.optim.lr_scheduler.ReduceLROnPlateau(topt, "min", **cfg)
        lr = 0.1
        for m in metrics:
            lr = mine.step(float(m), lr)
            tsch.step(float(m))
            assert lr == pytest.approx(topt.param_groups[0]["lr"], abs=0), (
                cfg, m, lr, topt.param_groups[0]["lr"])


@pytest.mark.slow
def test_cogmen_fullrun_equivalence():
    """72 Adam steps + per-epoch eval + plateau: the jax COGMEN stack and
    the torch replica of the reference semantics land on the same losses,
    eval NLL, LR schedule, and predictions."""
    from erc_tpu.models.cogmen import COGMENModule
    from erc_tpu.train import optim as optim_factory

    n_classes, S, wp, wf = 4, 2, 5, 5
    data = proto_batches(n_classes=n_classes, n_batches=N_BATCHES + 1)
    train, eval_batch = data[:-1], data[-1]
    Din = train[0][0]["input_tensor"].shape[-1]
    model = COGMENModule(
        input_size=Din, hidden_size=16, num_head=17, n_speakers=S,
        n_classes=n_classes, wp=wp, wf=wf, graph_impl="dense",
        encoder_mode="reference",
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        train[0][0], deterministic=True,
    )
    cfg = optim_factory.create_optim("Adam", lr=1e-3, weight_decay=1e-8)
    tx = optim_factory.build_optim(cfg)
    leaf = LeafStore(jax.tree_util.tree_map(np.asarray, variables["params"]))
    with torch.enable_grad():  # materialize replica leaves for the optimizer
        cogmen_ref_loss(leaf, train[0][0], train[0][1], S, wp, wf)
    topt = torch.optim.Adam(list(leaf.t.values()), lr=1e-3, weight_decay=1e-8)

    loss_fn = lambda lf, b, lens: cogmen_ref_loss(lf, b, lens, S, wp, wf)
    hist, params, j_pred = run_full_training(
        model, variables, tx, train, eval_batch, leaf, loss_fn, topt
    )
    with torch.no_grad():
        # replica predictions: recompute valid-row logits leaf-wise is
        # internal to the loss; compare via the jax stack at torch's params
        t_params = _leafstore_to_tree(leaf, variables["params"])
        t_logits = model.apply({**variables, "params": t_params},
                               eval_batch[0], deterministic=True)
    t_pred = np.argmax(valid_rows(np.asarray(t_logits), eval_batch[1]), -1)
    assert_runs_equivalent(hist, j_pred, t_pred)


@pytest.mark.slow
def test_dagerc_fullrun_equivalence():
    """72 AdamW+clip(5.0) steps + eval + plateau for DAG-ERC — the
    clip-before-step ordering and decoupled decay hold over a full run."""
    from erc_tpu.models.dagerc import DAGERCModule
    from erc_tpu.train import optim as optim_factory

    n_classes, layers, D, windowp = 4, 2, 12, 1
    data = proto_batches(n_classes=n_classes, n_batches=N_BATCHES + 1, seed=3,
                         noise=2.0)
    train, eval_batch = data[:-1], data[-1]
    Din = train[0][0]["input_tensor"].shape[-1]
    model = DAGERCModule(
        emb_dim=Din, n_classes=n_classes, gnn_layers=layers, hidden_dim=D,
        windowp=windowp, drop_rate=0.0,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        train[0][0], deterministic=True,
    )
    cfg = optim_factory.create_optim("AdamW", lr=1e-3, weight_decay=1e-2)
    tx = optim_factory.build_optim(cfg, grad_clip_norm=5.0)
    leaf = LeafStore(jax.tree_util.tree_map(np.asarray, variables["params"]))
    with torch.enable_grad():
        dagerc_ref_loss(leaf, train[0][0], train[0][1], layers, D, windowp)
    topt = torch.optim.AdamW(list(leaf.t.values()), lr=1e-3, weight_decay=1e-2)

    loss_fn = lambda lf, b, lens: dagerc_ref_loss(lf, b, lens, layers, D, windowp)
    hist, params, j_pred = run_full_training(
        model, variables, tx, train, eval_batch, leaf, loss_fn, topt,
        clip_norm=5.0,
    )
    with torch.no_grad():
        t_params = _leafstore_to_tree(leaf, variables["params"])
        t_logits = model.apply({**variables, "params": t_params},
                               eval_batch[0], deterministic=True)
    t_pred = np.argmax(valid_rows(np.asarray(t_logits), eval_batch[1]), -1)
    assert_runs_equivalent(hist, j_pred, t_pred)


def _leafstore_to_tree(leaf, template):
    """Rebuild a flax param tree from the torch replica's trained leaves
    (leaves the torch replica never materialized keep the jax value —
    none such exist for these models; LeafStore.compare guards that in the
    grad-parity tests)."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        key = "/".join(path)
        if key in leaf.t:
            return jnp.asarray(leaf.t[key].detach().numpy())
        return jnp.asarray(node)

    return walk(template, ())


# ----------------------------------------------------------- MMGCN replica
def mmgcn_ref_loss_factory(leaf, n_dim=200, nh=24, nlayers=6):
    """Differentiable torch replica of MMGCN (linear encoders + 2-layer
    biLSTM + speaker embed + feature-dependent big adjacency + GCNII stack;
    mmgcn_models.py:8-39,344-394,582-646), packaged as a per-batch loss —
    the same math as test_grad_parity_zoo.test_mmgcn_grad_parity.  The
    torch LSTM's Parameters are SHARED with the LeafStore so optimizer
    steps land on the same tensors both stacks read."""
    from test_grad_parity_zoo import share_rnn

    lstm = torch.nn.LSTM(n_dim, 100, num_layers=2, bidirectional=True,
                         batch_first=True, dropout=0.0)
    share_rnn(lstm, leaf, ("lstm_l",), layers=2)

    def loss_fn(leaf, batch, lens):
        a = t_(batch["audio_feature"]) @ leaf("linear_a", "kernel") + leaf("linear_a", "bias")
        v = t_(batch["visual_feature"]) @ leaf("linear_v", "kernel") + leaf("linear_v", "bias")
        l0 = t_(batch["text_feature"]) @ leaf("linear_l", "kernel") + leaf("linear_l", "bias")
        l = lstm(l0)[0]  # unpacked; equal lengths only
        spk = torch.from_numpy(np.asarray(batch["speaker_ids"])).long()
        l = l + leaf("speaker_embeddings", "embedding")[spk]

        fa = torch.cat([a[i, :ln] for i, ln in enumerate(lens)], 0)
        fv = torch.cat([v[i, :ln] for i, ln in enumerate(lens)], 0)
        fl = torch.cat([l[i, :ln] for i, ln in enumerate(lens)], 0)
        N = fa.shape[0]
        feats = [fa, fv, fl]
        blocks = torch.zeros(3 * N, 3 * N)
        start = 0
        for ln in lens:
            for m in range(3):
                for n2 in range(3):
                    ms, ns = start + N * m, start + N * n2
                    if m == n2:
                        x = feats[m][start : start + ln]
                        xn = x / x.norm(dim=1, keepdim=True)
                        cs = (xn @ xn.T).clamp(-0.99999, 0.99999) * 0.99999
                        blocks = blocks.index_put(
                            (torch.arange(ms, ms + ln)[:, None],
                             torch.arange(ns, ns + ln)[None, :]),
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
        logits = feat @ leaf("smax_fc", "kernel") + leaf("smax_fc", "bias")
        labels = valid_rows(np.asarray(batch["label"])[..., None], lens)[:, 0]
        return F.cross_entropy(logits, torch.from_numpy(labels).long())

    return loss_fn


@pytest.mark.slow
def test_mmgcn_fullrun_equivalence():
    """72 Adam steps + eval + plateau for MMGCN — biLSTM encoders, the
    feature-dependent arccos adjacency, and the GCNII layer restructure
    (split support matmul) hold over a full training run."""
    from erc_tpu.models.mmgcn import MMGCNModule
    from erc_tpu.train import optim as optim_factory

    n_classes, nlayers, nh, n_dim = 4, 6, 24, 200
    data = proto_batches(n_classes=n_classes, lens=(6, 6, 6),
                         n_batches=N_BATCHES + 1, seed=11, noise=2.0)
    train, eval_batch = data[:-1], data[-1]
    model = MMGCNModule(
        n_speakers=2, n_classes=n_classes, modals="atv", n_dim=n_dim,
        graph_hidden_size=nh, gcn_layers=nlayers, adj_impl="dense",
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        train[0][0], deterministic=True,
    )
    # reference mmgcn optimizer: Adam lr 3e-4, wd 3e-5 (mmgcn.py reimplement)
    cfg = optim_factory.create_optim("Adam", lr=3e-4, weight_decay=3e-5)
    tx = optim_factory.build_optim(cfg)
    leaf = LeafStore(jax.tree_util.tree_map(np.asarray, variables["params"]))
    loss_fn = mmgcn_ref_loss_factory(leaf, n_dim=n_dim, nh=nh, nlayers=nlayers)
    with torch.enable_grad():  # materialize leaves
        loss_fn(leaf, train[0][0], train[0][1])
    topt = torch.optim.Adam(list(leaf.t.values()), lr=3e-4, weight_decay=3e-5)

    hist, params, j_pred = run_full_training(
        model, variables, tx, train, eval_batch, leaf, loss_fn, topt,
        plateau_kw=dict(threshold=2e-2),  # eval improvement floors at ~1.3%/ep
    )
    with torch.no_grad():
        t_params = _leafstore_to_tree(leaf, variables["params"])
        t_logits = model.apply({**variables, "params": t_params},
                               eval_batch[0], deterministic=True)
    t_pred = np.argmax(valid_rows(np.asarray(t_logits), eval_batch[1]), -1)
    assert_runs_equivalent(hist, j_pred, t_pred)


# ------------------------------------------------------------- CIM replica
def cim_ref_loss_factory(leaf, dims, H, emo_of_label):
    """Differentiable torch replica of CIM (packed biGRUs + relu adapters +
    six pairwise −10000-masked attention products + dual CE/BCE heads;
    cim_models.py:64-229), packaged per-batch — the same math as
    test_grad_parity_zoo.test_cim_grad_parity.  GRU Parameters are SHARED
    with the LeafStore so optimizer steps land on the tensors both stacks
    read.  The multitask BCE target is emo_of_label[label]."""
    from test_grad_parity_zoo import share_rnn

    da, dt, dv = dims
    grus = {}
    for m, din in (("a", da), ("v", dv), ("t", dt)):
        grus[m] = torch.nn.GRU(din, H, num_layers=1, bidirectional=True,
                               batch_first=True)
        share_rnn(grus[m], leaf, (f"rnn_{m}",), layers=1)

    def loss_fn(leaf, batch, lens):
        mask = np.asarray(batch["attention_mask"])
        dense = {}
        for m, key in (("a", "audio_feature"), ("v", "visual_feature"),
                       ("t", "text_feature")):
            x = t_(batch[key])
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                x, torch.tensor(lens), batch_first=True, enforce_sorted=False
            )
            h, _ = torch.nn.utils.rnn.pad_packed_sequence(
                grus[m](packed)[0], batch_first=True, total_length=x.shape[1]
            )
            dense[m] = torch.relu(
                h @ leaf(f"adapter_{m}", "kernel") + leaf(f"adapter_{m}", "bias")
            )

        tm = t_(mask.astype(np.float32))

        def att(x, y):
            s = x @ y.transpose(-1, -2) + (1.0 - tm[:, None, :]) * -10000.0
            return torch.softmax(s, -1) @ y * x

        a, v, t = dense["a"], dense["v"], dense["t"]
        merged = torch.cat(
            [att(a, v), att(v, a), att(t, a), att(t, v), att(a, t), att(v, t),
             a, v, t], -1
        )
        ref2 = merged @ leaf("cls2", "kernel") + leaf("cls2", "bias")
        ref7 = merged @ leaf("cls7", "kernel") + leaf("cls7", "bias")

        labels = valid_rows(np.asarray(batch["label"])[..., None], lens)[:, 0]
        r2 = torch.cat([ref2[i, :ln] for i, ln in enumerate(lens)], 0)
        r7 = torch.cat([ref7[i, :ln] for i, ln in enumerate(lens)], 0)
        e7 = t_(emo_of_label[labels].astype(np.float32))
        return F.cross_entropy(r2, torch.from_numpy(labels).long()) + \
            F.binary_cross_entropy_with_logits(r7, e7)

    return loss_fn


@pytest.mark.slow
def test_cim_fullrun_equivalence():
    """72 Adam steps + eval + plateau for CIM — the packed-GRU encoders,
    six pairwise attention products, and the CE+BCE multitask loss (both
    heads live) hold over a full training run (cim.py:43 Adam lr=1e-3)."""
    from erc_tpu.models.cim import CIMModule, masked_bce_with_logits
    from erc_tpu.train import optim as optim_factory
    from erc_tpu.train.trainer import masked_cross_entropy

    n_classes, H, dims = 4, 12, (7, 9, 11)
    data = proto_batches(n_classes=n_classes, dims=dims,
                         n_batches=N_BATCHES + 1, seed=7, noise=1.5)
    train, eval_batch = data[:-1], data[-1]
    # deterministic class→7-bit multilabel target so the BCE head learns too
    emo_of_label = (np.random.default_rng(42).random((n_classes, 7)) < 0.5
                    ).astype(np.int32)

    da, dt, dv = dims
    model = CIMModule(text_dim=dt, audio_dim=da, visual_dim=dv,
                      hidden_size=H, n_classes=n_classes)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        train[0][0], deterministic=True,
    )

    def jax_loss_fn(params, batch):
        lg2, lg7 = model.apply({**variables, "params": params}, batch,
                               deterministic=True)
        mask = jnp.asarray(batch["attention_mask"])
        labels = jnp.asarray(batch["label"])
        emo = jnp.asarray(emo_of_label)[jnp.clip(labels, 0, n_classes - 1)]
        return masked_cross_entropy(lg2, labels, mask) + \
            masked_bce_with_logits(lg7, emo.astype(jnp.float32), mask)

    def pred_logits_fn(params, batch):
        lg2, _ = model.apply({**variables, "params": params}, batch,
                             deterministic=True)
        return lg2

    cfg = optim_factory.create_optim("Adam", lr=1e-3)
    tx = optim_factory.build_optim(cfg)
    leaf = LeafStore(jax.tree_util.tree_map(np.asarray, variables["params"]))
    loss_fn = cim_ref_loss_factory(leaf, dims, H, emo_of_label)
    with torch.enable_grad():  # materialize replica leaves
        loss_fn(leaf, train[0][0], train[0][1])
    topt = torch.optim.Adam(list(leaf.t.values()), lr=1e-3)

    hist, params, j_pred = run_full_training(
        model, variables, tx, train, eval_batch, leaf, loss_fn, topt,
        jax_loss_fn=jax_loss_fn, pred_logits_fn=pred_logits_fn,
        # CIM converges slower than the ERC GNNs: per-epoch improvement only
        # falls under 5% around epoch 15, so run 20 epochs to exercise the
        # plateau decision on both stacks
        plateau_kw=dict(threshold=5e-2), n_epochs=20,
    )
    with torch.no_grad():
        t_params = _leafstore_to_tree(leaf, variables["params"])
        t_lg2, _ = model.apply({**variables, "params": t_params},
                               eval_batch[0], deterministic=True)
    t_pred = np.argmax(valid_rows(np.asarray(t_lg2), eval_batch[1]), -1)
    assert_runs_equivalent(hist, j_pred, t_pred)


# ------------------------------------------------------------ DGCN replica
def dgcn_ref_loss_factory(leaf, Din, hidden, S, wp, wf):
    """Differentiable torch replica of DialogueGCN v1 (packed 2-layer
    biLSTM, windowed EdgeAtt softmax, basis RGCN with edge_norm, GraphConv,
    2-layer classifier; dgcn_models.py:48-170 + PyG-1.4.2 semantics),
    packaged per-batch — the same math as
    test_model_torch_parity.test_dgcn_grad_parity but with the per-edge
    message loop batched through index_add.  LSTM Parameters are SHARED
    with the LeafStore."""
    from test_grad_parity_zoo import share_rnn
    from test_model_torch_parity import edge_perms, rel_id

    lstm = torch.nn.LSTM(Din, hidden // 2, num_layers=2, bidirectional=True,
                         batch_first=True, dropout=0.0)
    share_rnn(lstm, leaf, ("rnn",), layers=2)

    def loss_fn(leaf, batch, lens):
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            t_(batch["input_tensor"]), torch.tensor(lens), batch_first=True,
            enforce_sorted=False,
        )
        feats_pad, _ = torch.nn.utils.rnn.pad_packed_sequence(
            lstm(packed)[0], batch_first=True,
            total_length=batch["input_tensor"].shape[1],
        )
        feats = torch.cat([feats_pad[i, :l] for i, l in enumerate(lens)], 0)

        W_att = leaf("edge_att", "weight")
        alphas = []
        for d, ln in enumerate(lens):
            xd = feats_pad[d]
            wx = xd @ W_att.T
            rows = []
            for j in range(ln):
                s0, e0 = max(0, j - wp), min(ln - 1, j + wf)
                score = wx[s0 : e0 + 1] @ xd[j]
                probs = torch.softmax(score, 0)
                rows.append(torch.cat(
                    [torch.zeros(s0), probs, torch.zeros(ln - e0 - 1)]))
            alphas.append(torch.stack(rows))

        edges_u, edges_v, rels, norm_vals = [], [], [], []
        off = 0
        for d, ln in enumerate(lens):
            spk = np.asarray(batch["speaker_ids"])[d]
            for u, v in edge_perms(ln, wp, wf):
                edges_u.append(u + off)
                edges_v.append(v + off)
                rels.append(rel_id(spk[u], spk[v], u, v, S))
                norm_vals.append(alphas[d][u, v])
            off += ln
        iu = torch.tensor(edges_u)
        iv = torch.tensor(edges_v)
        ir = torch.tensor(rels)
        nr = torch.stack(norm_vals)

        W = torch.einsum("rb,bde->rde", leaf("conv1", "att"),
                         leaf("conv1", "basis"))
        g = feats @ leaf("conv1", "root") + leaf("conv1", "bias")
        msgs = nr[:, None] * torch.einsum("ed,edo->eo", feats[iu], W[ir])
        n = feats.shape[0]
        g = g + torch.zeros(n, W.shape[-1]).index_add(0, iv, msgs)

        agg = torch.zeros(n, g.shape[-1]).index_add(0, iv, g[iu])
        g2 = (
            agg @ leaf("conv2", "lin_rel", "kernel")
            + leaf("conv2", "lin_rel", "bias")
            + g @ leaf("conv2", "lin_root", "kernel")
            + leaf("conv2", "lin_root", "bias")
        )
        h = torch.cat([feats, g2], -1)
        h = torch.relu(h @ leaf("clf_lin1", "kernel") + leaf("clf_lin1", "bias"))
        ref_logits = h @ leaf("clf_lin2", "kernel") + leaf("clf_lin2", "bias")

        labels = valid_rows(np.asarray(batch["label"])[..., None], lens)[:, 0]
        return F.cross_entropy(ref_logits, torch.from_numpy(labels).long())

    return loss_fn


@pytest.mark.slow
def test_dgcn_fullrun_equivalence():
    """Full Adam run (lr 3e-4, dgcn.py:44) + eval + plateau for DialogueGCN
    v1 — packed biLSTM, EdgeAtt, basis RGCN with edge_norm, and GraphConv
    hold over a complete training protocol."""
    from erc_tpu.models.dgcn import DGCNModule
    from erc_tpu.train import optim as optim_factory

    n_classes, S, wp, wf, hidden = 4, 2, 10, 10, 16
    # dgcn's reference lr (3e-4) on a 16-wide model learns slowly: easier
    # data + a longer run keep the progress assertion meaningful
    data = proto_batches(n_classes=n_classes, n_batches=N_BATCHES + 1,
                         seed=5, noise=0.7)
    train, eval_batch = data[:-1], data[-1]
    Din = train[0][0]["input_tensor"].shape[-1]
    model = DGCNModule(
        input_size=Din, hidden_size=hidden, n_speakers=S, wp=wp, wf=wf,
        n_classes=n_classes, graph_impl="dense",
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        train[0][0], deterministic=True,
    )
    # the test runs lr 1e-3 (not the trainer's reference 3e-4, dgcn.py:44):
    # at 3e-4 this 16-wide synthetic config sits in biLSTM warmup for the
    # whole short run (probed: eval 1.37->1.24 over 16 epochs, accelerating)
    # and the progress/plateau assertions would be vacuous; equivalence of
    # the two stacks is lr-independent.  threshold=5e-4 makes the plateau
    # fire on a decisive mid-run regression (~3% worse-than-best epoch)
    # instead of the hovering 0.1%-improvement first epoch.
    cfg = optim_factory.create_optim("Adam", lr=1e-3, weight_decay=0)
    tx = optim_factory.build_optim(cfg)
    leaf = LeafStore(jax.tree_util.tree_map(np.asarray, variables["params"]))
    loss_fn = dgcn_ref_loss_factory(leaf, Din, hidden, S, wp, wf)
    with torch.enable_grad():  # materialize replica leaves
        loss_fn(leaf, train[0][0], train[0][1])
    topt = torch.optim.Adam(list(leaf.t.values()), lr=1e-3, weight_decay=0)

    hist, params, j_pred = run_full_training(
        model, variables, tx, train, eval_batch, leaf, loss_fn, topt,
        plateau_kw=dict(threshold=5e-4), n_epochs=16,
    )
    with torch.no_grad():
        t_params = _leafstore_to_tree(leaf, variables["params"])
        t_logits = model.apply({**variables, "params": t_params},
                               eval_batch[0], deterministic=True)
    t_pred = np.argmax(valid_rows(np.asarray(t_logits), eval_batch[1]), -1)
    assert_runs_equivalent(hist, j_pred, t_pred)


# --------------------------------------------- dgcnv2 / DialogueRNN replica
def dgcnv2_ref_loss_factory(leaf, S, wp, wf, hidden, d_g, d_p):
    """Differentiable torch replica of dgcnv2 with the DialogueRNN base
    encoder (DialogueRNNCell dgcnv2_models.py:235-347 with 'general'
    matching attention, MaskedEdgeAttention 'attn1' :517-562, basis RGCN +
    GraphConv GraphNetwork :753-773, matchatt 'general2' + classifier
    :693-750), packaged per-batch — the same math as
    test_grad_parity_zoo.test_dgcnv2_dialoguernn_forward_and_grad_parity.
    Every weight flows through the LeafStore (the nested GRU cells are
    explicit leaf matmuls, so no torch modules need sharing)."""
    from test_grad_parity_zoo import gru_t

    def drnn(prefix, U, qm):
        """DialogueRNN over one dialogue's valid prefix. U [ln, Dm],
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

    def loss_fn(leaf, batch, lens):
        spk_all = np.asarray(batch["speaker_ids"])
        em_list = []
        for d, ln in enumerate(lens):
            U = t_(np.asarray(batch["input_tensor"])[d, :ln])
            qm = torch.from_numpy(np.eye(S, dtype=np.float32)[spk_all[d, :ln]])
            f = drnn("dialog_rnn_f", U, qm)
            b = drnn("dialog_rnn_r", torch.flip(U, [0]), torch.flip(qm, [0]))
            b = torch.flip(b, [0])
            em_list.append(torch.cat([f, b], -1))  # [ln, 2*hidden]

        ref_logits = _dgcnv2_graph_pipeline(leaf, em_list, lens, spk_all, S, wp, wf)
        labels = valid_rows(np.asarray(batch["label"])[..., None], lens)[:, 0]
        return F.cross_entropy(ref_logits, torch.from_numpy(labels).long())

    return loss_fn


def _dgcnv2_graph_pipeline(leaf, em_list, lens, spk_all, S, wp, wf):
    """The post-encoder dgcnv2 pipeline (MaskedEdgeAttention 'attn1' →
    basis RGCN + GraphConv → matchatt 'general2' → classifier), shared by
    the DialogueRNN and DailyDialog replicas.  Returns flattened
    valid-node logits."""
    from test_model_torch_parity import edge_perms, rel_id

    # MaskedEdgeAttention 'attn1': alpha[u, v] = softmax_v∈win(u) W[u]·em_v
    W_sc = leaf("att_model", "scalar")
    edges_u, edges_v, rels, norm_vals = [], [], [], []
    off = 0
    for d, ln in enumerate(lens):
        emd = em_list[d]
        wx = W_sc[:ln] @ emd.T  # [ln(u), ln(v)]
        spk = spk_all[d]
        probs = {
            u: torch.softmax(
                wx[u, max(0, u - wp): min(ln - 1, u + wf) + 1], 0)
            for u in range(ln)
        }
        for u, v in edge_perms(ln, wp, wf):
            edges_u.append(u + off)
            edges_v.append(v + off)
            rels.append(rel_id(spk[u], spk[v], u, v, S))
            norm_vals.append(probs[u][v - max(0, u - wp)])
        off += ln

    em_flat = torch.cat(em_list, 0)
    N = em_flat.shape[0]
    iu = torch.tensor(edges_u)
    iv = torch.tensor(edges_v)
    ir = torch.tensor(rels)
    nr = torch.stack(norm_vals)
    Wr = torch.einsum("rb,bde->rde", leaf("conv1", "att"),
                      leaf("conv1", "basis"))
    g = em_flat @ leaf("conv1", "root") + leaf("conv1", "bias")
    msgs = nr[:, None] * torch.einsum("ed,edo->eo", em_flat[iu], Wr[ir])
    g = g + torch.zeros(N, Wr.shape[-1]).index_add(0, iv, msgs)

    agg = torch.zeros(N, g.shape[-1]).index_add(0, iv, g[iu])
    g2 = (
        agg @ leaf("conv2", "lin_rel", "kernel")
        + leaf("conv2", "lin_rel", "bias")
        + g @ leaf("conv2", "lin_root", "kernel")
        + leaf("conv2", "lin_root", "bias")
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
    return h @ leaf("smax_fc", "kernel") + leaf("smax_fc", "bias")


@pytest.mark.slow
def test_dgcnv2_fullrun_equivalence():
    """Full Adam run (reference lr 3e-4, dgcnv2.py:38) + eval + plateau for
    dgcnv2/DialogueRNN — the nested-scan recurrence, MaskedEdgeAttention,
    GraphNetwork, and general2 nodal attention hold over a complete
    training protocol.  Closes the last full-run-equivalence family."""
    from erc_tpu.models.dgcnv2 import DGCNV2Module
    from erc_tpu.train import optim as optim_factory

    n_classes, S, wp, wf = 4, 2, 2, 2
    hidden, d_g, d_p, gh = 10, 8, 8, 12
    data = proto_batches(n_classes=n_classes, n_batches=N_BATCHES + 1,
                         seed=17, noise=0.7)
    train, eval_batch = data[:-1], data[-1]
    Din = train[0][0]["input_tensor"].shape[-1]
    L = np.asarray(train[0][0]["attention_mask"]).shape[1]
    model = DGCNV2Module(
        base_model="DialogRNN", input_size=Din, hidden_size=hidden,
        n_speakers=S, wp=wp, wf=wf, n_classes=n_classes, max_seq_len=L,
        graph_hidden_size=gh, d_g=d_g, d_p=d_p,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        train[0][0], deterministic=True,
    )
    # the test runs lr 3e-3 (not the trainer's reference 3e-4, dgcnv2.py:38):
    # the 10-wide DialogueRNN stack sits in warmup for the whole short run at
    # the reference lr (probed: loss 1.383 -> 1.378 over 12 epochs) and the
    # progress/plateau assertions would be vacuous; equivalence of the two
    # stacks is lr-independent.
    cfg = optim_factory.create_optim("Adam", lr=3e-3, weight_decay=0)
    tx = optim_factory.build_optim(cfg)
    leaf = LeafStore(jax.tree_util.tree_map(np.asarray, variables["params"]))
    loss_fn = dgcnv2_ref_loss_factory(leaf, S, wp, wf, hidden, d_g, d_p)
    with torch.enable_grad():  # materialize replica leaves
        loss_fn(leaf, train[0][0], train[0][1])
    topt = torch.optim.Adam(list(leaf.t.values()), lr=3e-3, weight_decay=0)

    # patience=4 (not the harness default 0): the DialogueRNN stack's eval
    # WORSENS for ~5 warmup epochs before learning kicks in (probed:
    # 1.387→1.418→…→1.28 by epoch 8) — patience=0 would halve the lr every
    # warmup epoch and freeze the run at lr≈5e-5.  With patience=4 the
    # plateau fires exactly once, at epoch 5 (the tail of the hover, with a
    # ≥3e-3 decision margin vs ~1e-5 cross-stack drift), then the descent
    # is smooth through epoch 20.  Longer runs reach the post-convergence
    # oscillation where chaotic divergence outruns the 5% loss tolerance.
    hist, params, j_pred = run_full_training(
        model, variables, tx, train, eval_batch, leaf, loss_fn, topt,
        plateau_kw=dict(patience=4), n_epochs=20,
    )
    with torch.no_grad():
        t_params = _leafstore_to_tree(leaf, variables["params"])
        t_logits = model.apply({**variables, "params": t_params},
                               eval_batch[0], deterministic=True)
    t_pred = np.argmax(valid_rows(np.asarray(t_logits), eval_batch[1]), -1)
    assert_runs_equivalent(hist, j_pred, t_pred)


# ------------------------------------------------------- MMIN-base replica
def mmin_base_fwd_factory(leaf, prefix=(), audio_dim=130, visual_dim=342):
    """Differentiable torch replica of ONE MMIN base net (LSTM+maxpool A/V
    encoders, TextCNN L encoder, 3-layer classifier returning (logits,
    penultimate feature); mmin_models.py:8-130, 202-240) whose params live
    under ``prefix`` in the LeafStore ('' = top level).  LSTM Parameters
    are SHARED with the LeafStore."""
    from test_grad_parity_zoo import share_rnn

    pfx = tuple(prefix) if not isinstance(prefix, str) else (prefix,)
    lstms = {}
    for net, din in (("netA", audio_dim), ("netV", visual_dim)):
        lstms[net] = torch.nn.LSTM(din, 128, num_layers=1, batch_first=True)
        share_rnn(lstms[net], leaf, pfx + (net, "rnn"), layers=1, bidirectional=False)

    def fwd(batch, akey="audio_feature", vkey="visual_feature", tkey="text_feature"):
        def lstm_maxpool(xkey, net):
            out, _ = lstms[net](t_(batch[xkey]))
            return out.max(dim=1).values

        def textcnn(xkey, net):
            x = t_(batch[xkey])
            outs = []
            for k in (3, 4, 5):
                w = leaf(*pfx, net, f"conv{k}", "kernel").permute(2, 0, 1).unsqueeze(1)
                b = leaf(*pfx, net, f"conv{k}", "bias")
                c = F.relu(F.conv2d(x[:, None], w, b).squeeze(3))
                outs.append(F.max_pool1d(c, c.shape[2]).squeeze(2))
            h = torch.cat(outs, 1)
            return F.relu(h @ leaf(*pfx, net, "embd", "kernel")
                          + leaf(*pfx, net, "embd", "bias"))

        h = torch.cat(
            [
                lstm_maxpool(akey, "netA"),
                lstm_maxpool(vkey, "netV"),
                textcnn(tkey, "netL"),
            ],
            -1,
        )
        for i in range(2):
            h = torch.relu(h @ leaf(*pfx, "netC", f"fc{i}", "kernel")
                           + leaf(*pfx, "netC", f"fc{i}", "bias"))
        logits = (h @ leaf(*pfx, "netC", "fc_out", "kernel")
                  + leaf(*pfx, "netC", "fc_out", "bias"))
        return logits, h

    return fwd


def masked_ce_t(logits, batch):
    sel = np.asarray(batch["sample_mask"]) > 0
    return F.cross_entropy(
        logits[torch.from_numpy(sel)],
        torch.from_numpy(np.asarray(batch["label"])[sel]).long(),
    )


def mmin_ref_loss_factory(leaf, audio_dim=130, visual_dim=342):
    """Masked-CE loss over one base net — the same math as
    test_grad_parity_zoo.test_mmin_base_grad_parity.  lens is ignored
    (utterance-level batches carry sample_mask instead)."""
    fwd = mmin_base_fwd_factory(leaf, (), audio_dim, visual_dim)

    def loss_fn(leaf, batch, lens):
        logits, _feat = fwd(batch)
        return masked_ce_t(logits, batch)

    return loss_fn


@pytest.mark.slow
def test_mmin_base_fullrun_equivalence():
    """Full Adam run (lr 2e-4, mmin_base.py:39) + eval + plateau for the
    MMIN base net — utterance-level batches, LSTM+maxpool and TextCNN
    encoders hold over a complete training protocol."""
    from erc_tpu.data.mmin import MMINBatcher, synthetic_mmin
    from erc_tpu.models.mmin_models import MMINBaseModule
    from erc_tpu.train import optim as optim_factory
    from erc_tpu.train.trainer import masked_cross_entropy

    n_classes, B = 4, 8
    samples = synthetic_mmin(n_classes, "train", n_train=B * (N_BATCHES + 1))
    # synthetic_mmin's 0.8-noise prototypes collapse the loss to ~1e-4 by
    # epoch 7, where relative plateau/NLL comparisons are meaningless; 6x
    # extra feature noise keeps the floor at ~0.3 with a decisive eval
    # regression around epoch 8 that exercises the plateau decision
    g = np.random.default_rng(13)
    for s in samples:
        for k in ("audio_feature", "visual_feature", "text_feature"):
            s[k] = (s[k] + 6.0 * g.normal(size=s[k].shape)).astype(np.float32)
    batcher = MMINBatcher(max_audio_len=16, has_miss=False, pad_batch_to=B)
    batches = [
        (batcher(samples[i * B : (i + 1) * B]), [1] * B)
        for i in range(N_BATCHES + 1)
    ]
    train, eval_batch = batches[:-1], batches[-1]

    model = MMINBaseModule(n_classes=n_classes)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        train[0][0], deterministic=True,
    )

    def jax_loss_fn(params, batch):
        logits, _fusion = model.apply({**variables, "params": params}, batch,
                                      deterministic=True)
        return masked_cross_entropy(
            logits, jnp.asarray(batch["label"]), jnp.asarray(batch["sample_mask"])
        )

    def pred_logits_fn(params, batch):
        logits, _fusion = model.apply({**variables, "params": params}, batch,
                                      deterministic=True)
        # [B, C] -> [B, 1, C] so the harness's valid_rows(lens=[1]*B) works
        return logits[:, None, :]

    cfg = optim_factory.create_optim("Adam", lr=2e-4, weight_decay=0)
    tx = optim_factory.build_optim(cfg)
    leaf = LeafStore(jax.tree_util.tree_map(np.asarray, variables["params"]))
    loss_fn = mmin_ref_loss_factory(leaf)
    with torch.enable_grad():  # materialize replica leaves
        loss_fn(leaf, train[0][0], train[0][1])
    topt = torch.optim.Adam(list(leaf.t.values()), lr=2e-4, weight_decay=0)

    hist, params, j_pred = run_full_training(
        model, variables, tx, train, eval_batch, leaf, loss_fn, topt,
        jax_loss_fn=jax_loss_fn, pred_logits_fn=pred_logits_fn,
    )
    with torch.no_grad():
        t_params = _leafstore_to_tree(leaf, variables["params"])
        t_lg, _ = model.apply({**variables, "params": t_params},
                              eval_batch[0], deterministic=True)
    t_pred = np.argmax(np.asarray(t_lg), -1)
    assert_runs_equivalent(hist, j_pred, t_pred)


# ------------------------------------------------------- MMIN-miss replica
def mminmiss_ref_loss_factory(leaf, ae_layers=(256, 128, 64), n_blocks=5,
                              input_dim=384):
    """Differentiable torch replica of the MMIN imagination net (tri-encoder
    + twin ResidualAEs + classifier-on-latent; mmin_models.py:133-199,
    mmin_miss.py:66-110) with the reference multitask loss
    Lce + 4·Lmse(reverse_enc, fusion) + 2·Lcycle(features, fusion_cycle)
    (mmin_miss.py:205-215).  The frozen pretrained-encoder regression
    target is precomputed into batch['reverse_target'] (it is
    stop_gradient'd constant data — identical on both stacks).  LSTM
    Parameters are SHARED with the LeafStore."""
    from test_grad_parity_zoo import share_rnn

    lstms = {}
    for net, din in (("netA", 130), ("netV", 342)):
        lstms[net] = torch.nn.LSTM(din, 128, num_layers=1, batch_first=True)
        share_rnn(lstms[net], leaf, (net, "rnn"), layers=1, bidirectional=False)

    def res_ae(net, x):
        """ResidualAE (mmin_models.py:133-199): block input accumulates the
        previous block's output; latents concatenate; transition MLP on
        (x_in + x_out)."""
        x_in = x
        x_out = torch.zeros_like(x)
        latents = []
        for b in range(n_blocks):
            x_in = x_in + x_out
            h = x_in
            for i in range(len(ae_layers)):
                h = h @ leaf(net, f"enc{b}_{i}", "kernel") + leaf(net, f"enc{b}_{i}", "bias")
                if i < len(ae_layers) - 1:
                    h = F.leaky_relu(h, 0.01)
            latents.append(h)
            widths = list(ae_layers)[::-1][1:] + [input_dim]
            for i in range(len(widths)):
                h = h @ leaf(net, f"dec{b}_{i}", "kernel") + leaf(net, f"dec{b}_{i}", "bias")
                if i < len(widths) - 1:
                    h = F.relu(h)
            x_out = h
        t = x_in + x_out
        t = torch.relu(t @ leaf(net, "trans0", "kernel") + leaf(net, "trans0", "bias"))
        t = t @ leaf(net, "trans1", "kernel") + leaf(net, "trans1", "bias")
        return t, torch.cat(latents, -1)

    def masked_mse_t(a, b, mask):
        per = ((a - b) ** 2).mean(-1)
        return (per * mask).sum() / torch.clamp(mask.sum(), min=1.0)

    def loss_fn(leaf, batch, lens):
        def lstm_maxpool(xkey, net):
            out, _ = lstms[net](t_(batch[xkey]))
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

        features = torch.cat(
            [
                lstm_maxpool("audio_feature", "netA"),
                lstm_maxpool("visual_feature", "netV"),
                textcnn("text_feature", "netL"),
            ],
            -1,
        )
        fusion, latent = res_ae("netAE", features)
        fusion_cycle, _ = res_ae("netAE_cycle", features)
        h = latent
        for i in range(2):
            h = torch.relu(h @ leaf("netC", f"fc{i}", "kernel")
                           + leaf("netC", f"fc{i}", "bias"))
        logits = h @ leaf("netC", "fc_out", "kernel") + leaf("netC", "fc_out", "bias")

        mask_np = np.asarray(batch["sample_mask"]) > 0
        Lce = F.cross_entropy(
            logits[torch.from_numpy(mask_np)],
            torch.from_numpy(np.asarray(batch["label"])[mask_np]).long(),
        )
        tm = t_(np.asarray(batch["sample_mask"], np.float32))
        rev = t_(batch["reverse_target"])
        Lmse = masked_mse_t(rev, fusion, tm)
        Lcycle = masked_mse_t(features, fusion_cycle, tm)
        return Lce + 4.0 * Lmse + 2.0 * Lcycle

    return loss_fn


@pytest.mark.slow
def test_mmin_miss_fullrun_equivalence():
    """Full Adam run + eval + plateau for MMIN-miss — the Missing-modality
    batches, twin ResidualAE imagination/cycle paths, the frozen
    pretrained-encoder MSE target, and the Lce+4·Lmse+2·Lcycle multitask
    weighting hold over a complete training protocol.  This is the only
    torch-parity coverage of ResidualAE anywhere in the suite."""
    from erc_tpu.data.mmin import MMINBatcher, synthetic_mmin
    from erc_tpu.models.mmin_miss import masked_mse
    from erc_tpu.models.mmin_models import MMINBaseModule, MMINMissModule
    from erc_tpu.train import optim as optim_factory
    from erc_tpu.train.trainer import masked_cross_entropy

    n_classes, B = 4, 8
    samples = synthetic_mmin(n_classes, "train", n_train=B * (N_BATCHES + 1))
    # same feature-noise trick as the base test: keep the CE floor nonzero
    # so plateau decisions compare meaningful numbers
    g = np.random.default_rng(23)
    for s in samples:
        for k in ("audio_feature", "visual_feature", "text_feature"):
            s[k] = (s[k] + 6.0 * g.normal(size=s[k].shape)).astype(np.float32)
    batcher = MMINBatcher(max_audio_len=16, has_miss=True, pad_batch_to=B,
                          rng=np.random.default_rng(5))
    batches = [
        (batcher(samples[i * B : (i + 1) * B]), [1] * B)
        for i in range(N_BATCHES + 1)
    ]

    model = MMINMissModule(n_classes=n_classes)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batches[0][0], deterministic=True,
    )
    # frozen random-init pretrained encoder (mmin_miss.py:55: None →
    # random); its encoding of the REVERSE features is the regression
    # target — constant data, so bake it into each batch once
    pretrained = MMINBaseModule(n_classes=n_classes)
    pp = pretrained.init({"params": jax.random.PRNGKey(7)}, batches[0][0],
                         deterministic=True)["params"]
    for b, _lens in batches:
        rev = {
            "audio_feature": b["audio_feature_reverse"],
            "visual_feature": b["visual_feature_reverse"],
            "text_feature": b["text_feature_reverse"],
        }
        b["reverse_target"] = np.asarray(
            pretrained.apply({"params": pp}, rev, deterministic=True,
                             method=pretrained.encode)
        )
    train, eval_batch = batches[:-1], batches[-1]

    def jax_loss_fn(params, batch):
        logits, fusion, fusion_cycle, features = model.apply(
            {**variables, "params": params}, batch, deterministic=True
        )
        mask = jnp.asarray(batch["sample_mask"])
        Lce = masked_cross_entropy(logits, jnp.asarray(batch["label"]), mask)
        Lmse = masked_mse(jnp.asarray(batch["reverse_target"]), fusion, mask)
        Lcycle = masked_mse(features, fusion_cycle, mask)
        return Lce + 4.0 * Lmse + 2.0 * Lcycle

    def pred_logits_fn(params, batch):
        logits, *_ = model.apply({**variables, "params": params}, batch,
                                 deterministic=True)
        return logits[:, None, :]

    cfg = optim_factory.create_optim("Adam", lr=2e-4, weight_decay=0)
    tx = optim_factory.build_optim(cfg)
    leaf = LeafStore(jax.tree_util.tree_map(np.asarray, variables["params"]))
    loss_fn = mminmiss_ref_loss_factory(leaf)
    with torch.enable_grad():  # materialize replica leaves
        loss_fn(leaf, train[0][0], train[0][1])
    topt = torch.optim.Adam(list(leaf.t.values()), lr=2e-4, weight_decay=0)

    hist, params, j_pred = run_full_training(
        model, variables, tx, train, eval_batch, leaf, loss_fn, topt,
        jax_loss_fn=jax_loss_fn, pred_logits_fn=pred_logits_fn,
    )
    with torch.no_grad():
        t_params = _leafstore_to_tree(leaf, variables["params"])
        t_lg, *_ = model.apply({**variables, "params": t_params},
                               eval_batch[0], deterministic=True)
    t_pred = np.argmax(np.asarray(t_lg), -1)
    # loss_rtol=0.3 (not the default 0.05): the 4·Lmse term against a
    # random-encoder target makes this the steepest landscape in the file
    # (loss 118 → ~6.3); per-step agreement stays ≤5% through the descent
    # but the post-convergence oscillation floor is chaotic enough that the
    # last-3-step mean is luck-dependent (observed 20% once under CPU
    # contention, where torch's thread-count-dependent reduction order
    # perturbs the replica).  The load-bearing assertions — near-exact
    # first steps, step-for-step plateau/LR decisions (3 firings), ≥90%
    # prediction agreement — keep the default strictness.
    assert_runs_equivalent(hist, j_pred, t_pred, loss_rtol=0.3)


# ------------------------------------------------------ MMIN-miss2 replica
def mminmiss2_ref_loss_factory(leaf):
    """Differentiable torch replica of mmin_miss2 (track_mm/mmin_miss2.py:
    131-226): twin base nets under 'net'/'netB' in one param tree, loss
    Lce + 4*Lmse(reverse_features, fusion_feature) + Lrce with NO
    stop-gradient — gradients flow into both nets (:194-208)."""
    fwd = mmin_base_fwd_factory(leaf, ("net",))
    fwdB = mmin_base_fwd_factory(leaf, ("netB",))

    def masked_mse_t(a, b, mask):
        per = ((a - b) ** 2).mean(-1)
        return (per * mask).sum() / torch.clamp(mask.sum(), min=1.0)

    def loss_fn(leaf, batch, lens):
        logits, feat = fwd(batch)
        rlogits, rfeat = fwdB(
            batch, "audio_feature_reverse", "visual_feature_reverse",
            "text_feature_reverse",
        )
        tm = t_(np.asarray(batch["sample_mask"], np.float32))
        return (masked_ce_t(logits, batch)
                + 4.0 * masked_mse_t(rfeat, feat, tm)
                + masked_ce_t(rlogits, batch))

    return loss_fn


@pytest.mark.slow
def test_mmin_miss2_fullrun_equivalence():
    """Full Adam run + eval + plateau for mmin_miss2 — the twin-net
    feature-matching method (NOT the mmin_miss imagination AE): both nets
    update jointly through the shared MSE and their own CE heads over a
    complete training protocol."""
    from erc_tpu.data.mmin import MMINBatcher, synthetic_mmin
    from erc_tpu.models.mmin_miss import masked_mse
    from erc_tpu.models.mmin_models import MMINMiss2Module
    from erc_tpu.train import optim as optim_factory
    from erc_tpu.train.trainer import masked_cross_entropy

    n_classes, B = 4, 8
    samples = synthetic_mmin(n_classes, "train", n_train=B * (N_BATCHES + 1))
    # same feature-noise trick as the base/miss tests: keep the CE floor
    # nonzero so plateau decisions compare meaningful numbers
    g = np.random.default_rng(31)
    for s in samples:
        for k in ("audio_feature", "visual_feature", "text_feature"):
            s[k] = (s[k] + 6.0 * g.normal(size=s[k].shape)).astype(np.float32)
    batcher = MMINBatcher(max_audio_len=16, has_miss=True, pad_batch_to=B,
                          rng=np.random.default_rng(7))
    batches = [
        (batcher(samples[i * B : (i + 1) * B]), [1] * B)
        for i in range(N_BATCHES + 1)
    ]
    train, eval_batch = batches[:-1], batches[-1]

    model = MMINMiss2Module(n_classes=n_classes)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        train[0][0], deterministic=True,
    )
    assert set(variables["params"]) == {"net", "netB"}

    def jax_loss_fn(params, batch):
        logits, fusion, rlogits, rfeat = model.apply(
            {**variables, "params": params}, batch,
            deterministic=True, with_reverse=True,
        )
        mask = jnp.asarray(batch["sample_mask"])
        labels = jnp.asarray(batch["label"])
        return (masked_cross_entropy(logits, labels, mask)
                + 4.0 * masked_mse(rfeat, fusion, mask)
                + masked_cross_entropy(rlogits, labels, mask))

    def pred_logits_fn(params, batch):
        logits, _ = model.apply({**variables, "params": params}, batch,
                                deterministic=True)
        return logits[:, None, :]

    cfg = optim_factory.create_optim("Adam", lr=2e-4, weight_decay=0)
    tx = optim_factory.build_optim(cfg)
    leaf = LeafStore(jax.tree_util.tree_map(np.asarray, variables["params"]))
    loss_fn = mminmiss2_ref_loss_factory(leaf)
    with torch.enable_grad():  # materialize replica leaves
        loss_fn(leaf, train[0][0], train[0][1])
    topt = torch.optim.Adam(list(leaf.t.values()), lr=2e-4, weight_decay=0)

    hist, params, _j_pred = run_full_training(
        model, variables, tx, train, eval_batch, leaf, loss_fn, topt,
        jax_loss_fn=jax_loss_fn, pred_logits_fn=pred_logits_fn,
    )
    # agreement over 24 utterances (eval + 2 train batches): the 8-sample
    # eval batch quantizes the ≥90% agreement floor at 12.5% steps, so one
    # borderline flip on a near-tied logit pair would fail a run whose
    # losses and plateau decisions match to 4 decimals
    t_params = _leafstore_to_tree(leaf, variables["params"])

    def all_preds(ptree):
        ps = []
        for b, _lens in [eval_batch] + train[:2]:
            lg, _ = model.apply({**variables, "params": ptree}, b,
                                deterministic=True)
            ps.append(np.argmax(np.asarray(lg), -1))
        return np.concatenate(ps)

    with torch.no_grad():
        t_pred = all_preds(t_params)
    assert_runs_equivalent(hist, all_preds(params), t_pred)


# ------------------------------------------------- DailyDialog (token) track
def daily_proto_batches(n_classes=4, vocab=60, n_words=8, lens=(5, 8, 3),
                        n_batches=7, seed=0, n_noise=0):
    """Token dialogues whose labels are inferable from class-signature
    token ranges — the TextCNN can actually learn them.  n_noise=0 keeps
    the task easy enough that learning completes before the max-over-time
    pooling's argmax switching drives the two stacks chaotically apart."""
    from erc_tpu.models.dgcnv2 import DailyBatcher

    batcher = DailyBatcher(n_words=n_words, max_len=max(lens))
    span = (vocab - 4) // n_classes
    out = []
    for b in range(n_batches):
        rng = np.random.default_rng(seed + b)
        samples = []
        for ln in lens:
            label = rng.integers(0, n_classes, size=ln)
            toks = [
                np.concatenate([
                    rng.integers(4 + int(y) * span, 4 + int(y) * span + span,
                                 size=n_words - n_noise),
                    rng.integers(1, vocab, size=n_noise),  # shared noise
                ]).astype(np.int64).tolist()
                for y in label
            ]
            samples.append({"tokens": toks, "label": label.tolist(),
                            "speakers": rng.integers(0, 2, size=ln).tolist()})
        out.append((batcher(samples), list(lens)))
    return out


def daily_ref_loss_factory(leaf, S, wp, wf, hidden, cnn_out,
                           kernel_sizes=(3, 4, 5)):
    """Differentiable torch replica of DialogueGCN_DailyModel
    (dgcnv2_models.py:818-927): CNNFeatureExtractor (:776-816, embed →
    VALID conv1d per K → relu → max-over-time → fc → relu, masked) → the
    reference's PACK-FREE 2-layer biLSTM on the padded batch
    (``self.lstm(U)``, :913-916 — padding zeros feed the backward
    direction) → the shared dgcnv2 graph pipeline.  LSTM Parameters are
    SHARED with the LeafStore; the jax side must run lstm_mode='unpacked'
    to execute the same graph."""
    from test_grad_parity_zoo import share_rnn

    lstm = torch.nn.LSTM(cnn_out, hidden, num_layers=2, bidirectional=True,
                         batch_first=True)
    share_rnn(lstm, leaf, ("rnn",), layers=2, bidirectional=True)

    def cnn(tok, mask):
        B, L, W = tok.shape
        emb = leaf("cnn_feat_extractor", "embedding", "embedding")[
            torch.from_numpy(tok.reshape(-1, W)).long()
        ]  # [BL, W, E]
        emb = emb.transpose(1, 2)  # [BL, E, W]
        pooled = []
        for K in kernel_sizes:
            w = leaf("cnn_feat_extractor", f"conv_{K}", "kernel").permute(2, 1, 0)
            b = leaf("cnn_feat_extractor", f"conv_{K}", "bias")
            c = F.relu(F.conv1d(emb, w, b))  # [BL, F, W-K+1]
            pooled.append(c.max(dim=2).values)
        h = torch.cat(pooled, 1)
        h = F.relu(h @ leaf("cnn_feat_extractor", "fc", "kernel")
                   + leaf("cnn_feat_extractor", "fc", "bias"))
        return h.reshape(B, L, -1) * torch.from_numpy(mask)[..., None]

    def loss_fn(leaf, batch, lens):
        tok = np.asarray(batch["token_ids"])
        mask = np.asarray(batch["attention_mask"], np.float32)
        U = cnn(tok, mask)
        em_all, _ = lstm(U)  # unpacked — reference-exact (incl. padding)
        spk_all = np.asarray(batch["speaker_ids"])
        em_list = [em_all[d, :ln] for d, ln in enumerate(lens)]
        ref_logits = _dgcnv2_graph_pipeline(leaf, em_list, lens, spk_all,
                                            S, wp, wf)
        labels = valid_rows(np.asarray(batch["label"])[..., None], lens)[:, 0]
        return F.cross_entropy(ref_logits, torch.from_numpy(labels).long())

    return loss_fn


@pytest.mark.slow
def test_dgcnv2_daily_fullrun_equivalence():
    """Full Adam run + eval + plateau for the DailyDialog track — token
    TextCNN front end + the reference's pack-free biLSTM + graph pipeline
    hold over a complete training protocol.  The 10th (and last) runnable
    module family to get full-run torch equivalence."""
    from erc_tpu.models.dgcnv2 import DGCNV2Module
    from erc_tpu.train import optim as optim_factory

    # calibration (measured): the token→CNN→biLSTM→graph path has a long
    # warm-up, so this family runs 12 train batches/epoch (not the shared
    # 6) at lr=5e-3 for 24 epochs — loss ratio 0.37 with the plateau
    # firing near the eval floor; patience=4 survives the warm-up hover
    n_classes, S, wp, wf = 4, 2, 2, 2
    vocab, n_words, E, filters, cnn_out = 60, 8, 24, 12, 24
    hidden, gh = 10, 12
    data = daily_proto_batches(n_classes=n_classes, vocab=vocab,
                               n_words=n_words, n_batches=13, seed=5)
    train, eval_batch = data[:-1], data[-1]
    L = np.asarray(train[0][0]["attention_mask"]).shape[1]
    model = DGCNV2Module(
        base_model="LSTM", input_size=cnn_out, hidden_size=hidden,
        n_speakers=S, wp=wp, wf=wf, n_classes=n_classes, max_seq_len=L,
        graph_hidden_size=gh, vocab_size=vocab, embedding_dim=E,
        cnn_output_size=cnn_out, cnn_filters=filters,
        lstm_mode="unpacked",
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        train[0][0], deterministic=True,
    )
    cfg = optim_factory.create_optim("Adam", lr=5e-3, weight_decay=0)
    tx = optim_factory.build_optim(cfg)
    leaf = LeafStore(jax.tree_util.tree_map(np.asarray, variables["params"]))
    loss_fn = daily_ref_loss_factory(leaf, S, wp, wf, hidden, cnn_out)
    with torch.enable_grad():  # materialize replica leaves
        loss_fn(leaf, train[0][0], train[0][1])
    topt = torch.optim.Adam(list(leaf.t.values()), lr=5e-3, weight_decay=0)

    hist, params, j_pred = run_full_training(
        model, variables, tx, train, eval_batch, leaf, loss_fn, topt,
        plateau_kw=dict(patience=4), n_epochs=24,
    )
    with torch.no_grad():
        t_params = _leafstore_to_tree(leaf, variables["params"])
        t_logits = model.apply({**variables, "params": t_params},
                               eval_batch[0], deterministic=True)
    t_pred = np.argmax(valid_rows(np.asarray(t_logits), eval_batch[1]), -1)
    # Family-specific assertions: max-over-time pooling switches its argmax
    # as filters train, so f32 noise compounds chaotically well before the
    # ~250 steps this deep token pipeline needs to converge (measured:
    # tracking holds to ~1e-2 for ~60+ steps, then end-states drift 10-30%
    # with BOTH sides converged).  Semantics equivalence is therefore
    # asserted in the trackable regime (extended early window near-exact),
    # and convergence asserted per-side; end-state equality is out of reach
    # for any calibration of this family, unlike the feature tracks.
    j, t = np.asarray(hist["j_loss"]), np.asarray(hist["t_loss"])
    np.testing.assert_allclose(j[:3], t[:3], rtol=1e-3)
    np.testing.assert_allclose(j[:36], t[:36], rtol=6e-2)
    assert j[-3:].mean() < 0.7 * j[:3].mean(), (j[:3], j[-3:])
    assert t[-3:].mean() < 0.7 * t[:3].mean(), (t[:3], t[-3:])
    # both plateau controllers fired near the eval floor
    assert hist["j_lr"][-1] < 0.9 * hist["j_lr"][0], hist["j_lr"]
    assert hist["t_lr"][-1] < 0.9 * hist["t_lr"][0], hist["t_lr"]
    agree = float(np.mean(j_pred == t_pred))
    assert agree >= 0.8, f"prediction agreement {agree}"
