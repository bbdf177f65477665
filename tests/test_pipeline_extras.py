"""DatasetBuilder, LoaderSide, interp→optax schedules, multi-step training."""

import numpy as np
import pytest

from erc_tpu.data.builder import DatasetBuilder
from erc_tpu.data.loader import DialogueLoader, LoaderSide
from erc_tpu.data.collate import ERCBatcher
from erc_tpu.data.synthetic import synthetic_erc


def test_dataset_builder_chain_and_transforms():
    samples = [{"v": i} for i in range(5)]
    calls = []

    def double(d):
        calls.append(d["v"])
        return {"v": d["v"] * 2}

    ds = (
        DatasetBuilder()
        .add_input("all", samples)
        .add_output("all", "all")
        .add_output_transform("all", double)
        .chain()
    )
    assert len(ds) == 5
    assert ds[2] == {"v": 4}
    ds2 = DatasetBuilder().add_input("a", samples).add_output("a", "x").zip()
    assert ds2[1] == {"x": {"v": 1}}


def test_dataset_builder_pseudo_sizing():
    samples = list(range(4))
    ds = DatasetBuilder().add_input("all", samples).add_output("all", "all").chain()
    ds.repeat(3)
    assert len(ds) == 12
    assert ds[5] == samples[1]
    ds.scale_to_size(7)
    assert len(ds) == 7
    ds2 = (
        DatasetBuilder().add_input("all", samples).add_output("all", "all").chain().subset([2, 3])
    )
    assert len(ds2) == 2 and ds2[0] == 2


def test_loader_side_zip_and_chain():
    s1 = synthetic_erc("iemocap-cogmen", 6, n_train=8, min_len=4, max_len=8)
    s2 = synthetic_erc("iemocap-cogmen", 6, n_train=4, min_len=4, max_len=8, seed=5)
    mk = lambda s: DialogueLoader(s, ERCBatcher("atv", 6, 2, max_len=8), 4, shuffle=False)
    side = LoaderSide().add("sup", mk(s1)).add("unsup", mk(s2), cycle=True).zip()
    batches = list(side)
    assert len(batches) == 2
    assert set(batches[0].keys()) == {"sup", "unsup"}
    chain = LoaderSide().add("a", mk(s1)).add("b", mk(s2)).chain()
    assert len(list(chain)) == 3


def test_interp_to_optax_schedule():
    import jax.numpy as jnp

    from erc_tpu.core import interp

    cos = interp.Cos(1.0, 0.1, 0, 100)
    fn = interp.to_optax_schedule(cos)
    for s in (0, 50, 100, 150):
        np.testing.assert_allclose(float(fn(jnp.asarray(s))), cos(s), rtol=1e-5)
    tri = interp.PeriodTriangle(0.0, 1.0, 10)
    fn2 = interp.to_optax_schedule(tri)
    np.testing.assert_allclose(float(fn2(jnp.asarray(5))), tri(5), rtol=1e-4)


def test_build_schedule_from_config():
    from erc_tpu.train.optim import create_schedule, build_schedule

    sche = create_schedule("Cos", start=1.0, end=0.0, left=0, right=10)
    fn = build_schedule(sche)
    assert abs(float(fn(0)) - 1.0) < 1e-6
    assert abs(float(fn(10))) < 1e-6
    assert build_schedule(None) is None


def test_declared_schedule_drives_injected_lr():
    """--optim.sche.name=Cos wires the interp curve into build_optim's
    injected learning_rate: the LR the optimizer actually applies follows
    the curve step by step."""
    import jax.numpy as jnp
    import optax

    from erc_tpu.core import interp
    from erc_tpu.train.optim import create_optim, build_optim, get_learning_rate

    cfg = create_optim("SGD", lr=123.0)  # base lr must be ignored
    cfg.from_args(["--sche.name=Cos", "--sche.start=1.0", "--sche.end=0.0",
                   "--sche.left=0", "--sche.right=10"])
    tx = build_optim(cfg)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    curve = interp.Cos(1.0, 0.0, 0, 10)
    for step in range(4):
        grads = {"w": jnp.ones(3)}
        updates, state = tx.update(grads, state, params)
        # sgd update = -lr * grad with lr = curve(step)
        np.testing.assert_allclose(
            np.asarray(updates["w"]), -curve(step) * np.ones(3), rtol=1e-5
        )
    # the injected hyperparam holds the LAST-applied LR (curve at step 3)
    assert abs(get_learning_rate(state) - curve(3)) < 1e-5


def test_declared_schedule_disables_plateau(tmp_path):
    import os

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.dagerc import DAGERCParams, DAGERCTrainer
    from erc_tpu.train.optim import get_learning_rate

    p = DAGERCParams()
    p.dataset = "synthetic-cogmen-6"
    p.max_seq_len = 8
    p.hidden_dim = 8
    p.gnn_layers = 1
    p.from_args(["--optim.sche.name=Constant", "--optim.sche.value=0.002"])
    p.iparams()
    tr = DAGERCTrainer(p)
    tr.initialize()
    lr0 = get_learning_rate(tr.state.opt_state)
    # plateau would fire on a flat metric stream; the declared schedule
    # must make _plateau_step a no-op instead
    for _ in range(tr.lr_sche.patience + 3):
        tr._plateau_step(1.0)
    assert get_learning_rate(tr.state.opt_state) == lr0
    assert abs(lr0 - 0.002) < 1e-8  # f32 storage of the declared value


@pytest.mark.slow
def test_multi_step_training_matches_single_step(tmp_path):
    """steps_per_call=2 must produce identical params to steps_per_call=1."""
    import os

    import jax

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer

    def run(spc):
        p = COGMENParams()
        p.dataset = "synthetic-cogmen-6"
        p.epoch = 1
        p.max_seq_len = 16
        p.train.batch_size = 8
        p.test.batch_size = 8
        p.eval_per_epoch = 0
        p.steps_per_call = spc
        p.heartbeat = False
        p.iparams()
        tr = COGMENTrainer(p)
        tr.train()
        return jax.tree_util.tree_map(np.asarray, tr.state.params)

    p1 = run(1)
    p2 = run(2)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_split_weight_decay_mask():
    """--optim.split_wd=1 matches the reference's 'bn'-only exclusion
    (contrib/make_optim.py:4-17); --optim.split_wd=full is the broader
    bias/norm/1-D policy."""
    import jax.numpy as jnp
    import numpy as np

    from erc_tpu.train import optim as optim_factory
    from erc_tpu.train.optim import wd_mask, wd_mask_bn

    params = {
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones(4)},
        "bn": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
        "layer_0": {"gru_c_b_ih": jnp.ones(8), "Wr0": jnp.ones((4, 4))},
    }
    # reference-exact: only 'bn'-scoped params excluded; biases still decay
    mb = wd_mask_bn(params)
    assert mb["dense"]["kernel"] and mb["dense"]["bias"]
    assert not mb["bn"]["scale"] and not mb["bn"]["bias"]
    assert mb["layer_0"]["gru_c_b_ih"] and mb["layer_0"]["Wr0"]
    # full: biases/norm/1-D leaves excluded too
    m = wd_mask(params)
    assert m["dense"]["kernel"] and not m["dense"]["bias"]
    assert not m["bn"]["scale"] and not m["bn"]["bias"]
    assert not m["layer_0"]["gru_c_b_ih"] and m["layer_0"]["Wr0"]

    import jax

    zero_g = jnp.zeros_like
    # split_wd=True → reference semantics: bias decays, bn does not
    cfg = optim_factory.create_optim("AdamW", lr=0.1, weight_decay=0.5, split_wd=True)
    tx = optim_factory.build_optim(cfg)
    st = tx.init(params)
    grads = jax.tree_util.tree_map(zero_g, params)
    updates, _ = tx.update(grads, st, params)
    assert float(np.abs(np.asarray(updates["dense"]["kernel"])).max()) > 0
    assert float(np.abs(np.asarray(updates["dense"]["bias"])).max()) > 0
    assert float(np.abs(np.asarray(updates["bn"]["scale"])).max()) == 0

    # split_wd=full → biases/norm excluded from decay
    cfg = optim_factory.create_optim("AdamW", lr=0.1, weight_decay=0.5, split_wd="full")
    tx = optim_factory.build_optim(cfg)
    st = tx.init(params)
    updates, _ = tx.update(grads, st, params)
    assert float(np.abs(np.asarray(updates["dense"]["kernel"])).max()) > 0
    assert float(np.abs(np.asarray(updates["dense"]["bias"])).max()) == 0
    assert float(np.abs(np.asarray(updates["bn"]["scale"])).max()) == 0


def test_analyse_condition_dsl(tmp_path):
    """Compare DSL + pandas collection (reference lumo/analyse
    condition.py/collect.py surface)."""
    import json
    import os

    from erc_tpu.analyse import C, collect_df, filter_by_condition

    root = str(tmp_path)
    for test, f1, seed in (("t1", 0.7, 1), ("t2", 0.4, 2), ("t3", 0.9, 3)):
        d = os.path.join(root, "experiment", "expA", test)
        os.makedirs(d)
        json.dump({"f1": f1, "acc": f1 - 0.1}, open(os.path.join(d, "metrics.json"), "w"))
        open(os.path.join(d, "params.yaml"), "w").write(f"dataset: synth\nseed: {seed}\n")

    df = collect_df(root=root)
    assert len(df) == 3 and "f1" in df.columns

    out = filter_by_condition(df, C.f1 >= 0.5)
    assert sorted(out["test"]) == ["t1", "t3"]
    out = filter_by_condition(df, C.seed.in_([1, 2]), C.test, C.f1)
    assert list(out.columns) == ["test", "f1"] and len(out) == 2
    out = filter_by_condition(df, C.f1 > 0.0, ~C.acc)
    assert "acc" not in out.columns and len(out) == 3


@pytest.mark.slow
def test_multi_eval_matches_single_eval(tmp_path, monkeypatch):
    """steps_per_call>1 groups eval batches into one scanned dispatch
    (trainer._multi_eval_fn); the collected predictions, NLL and metrics
    must be IDENTICAL to the one-dispatch-per-batch path.  Covers the
    tuple-logits collectors too (mmin EMA pair) via the mmin trainer."""
    import os

    import jax

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer
    from erc_tpu.models.mmin_base import MMINBaseParams, MMINBaseTrainer

    def run(cls_p, cls_t, dataset, spc, eval_spc=0):
        p = cls_p()
        p.dataset = dataset
        p.epoch = 1
        p.max_seq_len = 16
        p.train.batch_size = 4
        p.test.batch_size = 4
        p.eval_per_epoch = 0
        p.steps_per_call = spc
        p.eval_steps_per_call = eval_spc
        p.heartbeat = False
        p.iparams()
        tr = cls_t(p)
        tr.initialize()
        tr._build_step_fns()
        res = tr.test()
        return tr, res

    for cls_p, cls_t, ds in (
        (COGMENParams, COGMENTrainer, "synthetic-cogmen-6"),
        (MMINBaseParams, MMINBaseTrainer, "synthetic-mmin-4"),
    ):
        tr1, r1 = run(cls_p, cls_t, ds, 1)
        tr8, r8 = run(cls_p, cls_t, ds, 8)
        # eval-only grouping: spc=1 training, scanned eval
        tre, re_ = run(cls_p, cls_t, ds, 1, eval_spc=8)
        for trx, rx in ((tr8, r8), (tre, re_)):
            assert tr1._true == trx._true and tr1._pred == trx._pred, ds
            assert abs(tr1._nll_sum - trx._nll_sum) < 1e-3, ds
            for k in r1:
                if isinstance(r1[k], float):
                    assert abs(r1[k] - rx[k]) < 1e-6, (ds, k)
