"""Callback subsystem: stop-file, checkpoint cadence, auto-resume, NaN guard."""

import json
import os

import numpy as np
import pytest


def _trainer(tmp_path, **over):
    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer

    p = COGMENParams()
    p.dataset = "synthetic-cogmen-6"
    p.epoch = 1
    p.max_seq_len = 16
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.eval_per_epoch = 0
    for k, v in over.items():
        p[k] = v
    p.iparams()
    return COGMENTrainer(p)


def test_stop_by_code(tmp_path):
    tr = _trainer(tmp_path)
    from erc_tpu.train.callbacks import StopByCode

    tr.initialize()
    cb = StopByCode(check_every=1).hook(tr)
    open(os.path.join(tr.exp.test_dir, ".stop"), "w").close()
    tr.global_steps = 1
    cb.train_step_end(tr, 0, {})
    assert tr.stopped


def test_epoch_checkpoint_and_auto_resume(tmp_path):
    tr = _trainer(tmp_path, checkpoint_per_epoch=1)
    tr.train()
    cps = tr.saver.list_checkpoints()
    assert len(cps) >= 1
    # same experiment dir → AutoResume picks up the checkpoint
    tr2 = _trainer(tmp_path, resume=True)
    tr2.exp = tr.exp
    tr2.saver = tr.saver
    tr2.initialize()
    from erc_tpu.train.callbacks import AutoResume

    AutoResume().train_begin(tr2)
    # counters restored: epoch-end checkpoint → resume at eidx+1; step
    # counter continues so new checkpoints outnumber old ones
    assert tr2.eidx == tr.eidx + 1
    assert tr2.global_steps == tr.global_steps
    import jax

    a = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, tr.state.params)
    )
    b = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, tr2.state.params)
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_auto_resume_survives_truncated_latest_checkpoint(tmp_path):
    """A crash can leave a corrupt newest checkpoint (torn copy, partial
    disk); resume must fall back to the previous intact one instead of
    dying.  Saver writes themselves are atomic (tmp+rename) — also checked:
    no .tmp litter after saves."""
    tr = _trainer(tmp_path, checkpoint_per_epoch=1, epoch=2)
    tr.train()
    cps = tr.saver.list_checkpoints()
    assert len(cps) >= 2
    assert not [f for f in os.listdir(tr.saver.save_dir) if f.endswith(".tmp")]

    with open(cps[-1], "r+b") as f:  # truncate the newest mid-"write"
        f.truncate(37)

    tr2 = _trainer(tmp_path, resume=True, epoch=2)
    tr2.exp = tr.exp
    tr2.saver = tr.saver
    tr2.initialize()
    from erc_tpu.train.callbacks import AutoResume

    AutoResume().train_begin(tr2)
    # resumed from the intact previous checkpoint (its meta carries eidx)
    meta = json.load(open(cps[-2] + ".json"))
    assert tr2.eidx == int(meta["eidx"]) + 1
    assert tr2.global_steps == int(meta["global_steps"])

    # torn meta sidecar next to an intact ckpt (pre-atomic writer debris):
    # resume proceeds with default counters instead of crashing
    with open(cps[-2] + ".json", "w") as f:
        f.write('{"eidx": 0, "glo')  # truncated json
    tr3 = _trainer(tmp_path, resume=True, epoch=2)
    tr3.exp = tr.exp
    tr3.saver = tr.saver
    tr3.initialize()
    AutoResume().train_begin(tr3)  # must not raise
    assert tr3.eidx == 0  # default counters (meta unreadable)


def test_nan_guard(tmp_path):
    tr = _trainer(tmp_path)
    tr.initialize()
    from erc_tpu.train.callbacks import NaNGuard

    cb = NaNGuard(check_every=1).hook(tr)
    tr.global_steps = 1
    cb.train_step_end(tr, 0, {"Lall": np.float32(1.0)})  # fine
    tr.global_steps = 2  # threshold cadence: advance past the last check
    with pytest.raises(FloatingPointError):
        cb.train_step_end(tr, 0, {"Lall": np.float32("nan")})
    # checkpoint was written before raising
    assert tr.saver.latest_checkpoint() is not None


def test_step_timer():
    import time

    from erc_tpu.train.profiler import StepTimer

    t = StepTimer(skip_first=1)
    for _ in range(4):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3
    assert 0.005 < s["mean_s"] < 0.1


def test_eval_first_and_final_report(tmp_path):
    tr = _trainer(tmp_path, eval_first=True)
    tr.train()
    # EvalFirst ran test() before epoch 0 → best metrics exist even though
    # eval_per_epoch=0; FinalReport wrote report.json
    assert tr.database.todict().get("f1") is not None
    rep = tr.exp.load_info("report")
    assert rep is not None and rep["global_steps"] == tr.global_steps
    assert "best" in rep


def test_keypoint_checkpoint(tmp_path):
    import glob

    tr = _trainer(tmp_path, keypoint_per_epoch=1)
    tr.train()
    keys = glob.glob(os.path.join(tr.saver.save_dir, "key.*.ckpt"))
    assert len(keys) == 1  # one epoch → one permanent keypoint
    # keypoints survive rotation pruning
    for _ in range(6):
        tr.save_checkpoint()
    assert glob.glob(os.path.join(tr.saver.save_dir, "key.*.ckpt")) == keys


def test_auto_resume_continues_epochs_end_to_end(tmp_path):
    """Preemption story: a run checkpointed at epoch 0 resumes and trains
    ONLY the remaining epochs, with continuing step numbers (so new
    checkpoints outnumber the stale ones)."""
    tr1 = _trainer(tmp_path, checkpoint_per_epoch=1)
    tr1.train()  # epoch=1 in the fixture
    steps_per_epoch = tr1.global_steps
    ck1 = tr1.saver.latest_checkpoint()

    tr2 = _trainer(tmp_path, checkpoint_per_epoch=1, resume=True, epoch=3)
    tr2.exp = tr1.exp
    tr2.saver = tr1.saver
    tr2.train()
    # resumed at epoch 1 → trained epochs 1 and 2 only
    assert tr2.global_steps == 3 * steps_per_epoch
    assert tr2.eidx == 2
    latest = tr2.saver.latest_checkpoint()
    assert latest != ck1  # new checkpoint, larger step number
    assert latest > ck1  # zero-padded names sort by step


def _train_epochs_run(tr):
    """Number of epochs the trainer actually TRAINED (train-stage board
    rows) — distinguishes a resumed run from a fresh one."""
    import json as _json

    rows = [_json.loads(l) for l in open(tr.exp.test_file("board.jsonl"))]
    return sum(1 for r in rows if r.get("stage") == "train")


def test_auto_resume_finds_sibling_run(tmp_path):
    """Real relaunch scenario (round-3 hardware burn-in finding): a
    preempted job relaunched with --resume gets a FRESH test dir whose own
    saver is empty — AutoResume must fall back to the newest sibling run
    of the same experiment with a compatible resume_hash (run-control
    knobs like --epoch may change across the relaunch)."""
    tr1 = _trainer(tmp_path, checkpoint_per_epoch=1)
    tr1.train()
    steps_per_epoch = tr1.global_steps

    # fresh trainer: NEW test dir, same experiment + params, longer epoch
    tr2 = _trainer(tmp_path, checkpoint_per_epoch=1, resume=True, epoch=3)
    assert tr2.exp.test_name != tr1.exp.test_name
    assert tr2.saver.latest_checkpoint() is None  # own saver empty
    tr2.train()
    assert tr2.global_steps == 3 * steps_per_epoch
    assert tr2.eidx == 2
    assert _train_epochs_run(tr2) == 2  # resumed: trained epochs 1..2 ONLY

    # a sibling with a DIFFERENT config must NOT be resumed across
    tr3 = _trainer(tmp_path, checkpoint_per_epoch=1, resume=True, epoch=1)
    tr3.params.optim.lr = 0.0123  # arch/optim change → different resume_hash
    tr3.train()
    assert _train_epochs_run(tr3) == 1  # fresh epoch 0

    # a CORRUPT newest sibling checkpoint must fall back to the next-oldest
    # intact one (same loop as own-run fallback, across runs)
    newest = max(
        (p for p in (tr1.saver.list_checkpoints() + tr2.saver.list_checkpoints())),
        key=os.path.getmtime,
    )
    with open(newest, "r+b") as f:
        f.truncate(29)
    tr4 = _trainer(tmp_path, checkpoint_per_epoch=1, resume=True, epoch=3)
    tr4.initialize()
    from erc_tpu.train.callbacks import AutoResume

    AutoResume().train_begin(tr4)
    assert tr4.global_steps > 0  # resumed from an intact sibling
    assert tr4.global_steps < 3 * steps_per_epoch  # not the corrupt newest

    # own saver NON-empty but entirely corrupt → must still reach an
    # intact sibling (review finding: the sibling branch used to be
    # gated on the own saver being empty)
    for cp in tr1.saver.list_checkpoints():
        with open(cp, "r+b") as f:
            f.truncate(17)
    tr5 = _trainer(tmp_path, checkpoint_per_epoch=1, resume=True, epoch=3)
    tr5.exp = tr1.exp
    tr5.saver = tr1.saver
    tr5.initialize()
    AutoResume().train_begin(tr5)
    assert tr5.global_steps > 0  # landed on tr2's intact checkpoint
