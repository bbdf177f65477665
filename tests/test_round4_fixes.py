"""Round-4 fixes (ADVICE r3 + VERDICT r3 items 9/10):

- resume_hash excludes distributed-launch knobs (coordinator/num_processes/
  process_id) so every process of one logical run agrees on resume identity
- AutoResume sibling discovery requires a readable meta sidecar with a
  MATCHING params_hash (hash-less/meta-less siblings are rejected)
- disk writes (Saver / MetricBoard / BestMetrics / PredictionStore) are
  gated on the main process; in-memory decisions still happen everywhere
- dataset_has_val is a registry property parsed from the name grammar,
  not a substring match
- legacy raw-audio augmentation helpers (reference
  augmentations/audio_strategies.py:24-66)
"""

import json
import os

import numpy as np
import pytest


# ------------------------------------------------------------- resume_hash
def test_resume_hash_ignores_launch_knobs():
    from erc_tpu.models.cogmen import COGMENParams

    p0 = COGMENParams()
    p0.dataset = "synthetic-cogmen-6"
    p0.iparams()
    base = p0.resume_hash()

    p1 = COGMENParams()
    p1.dataset = "synthetic-cogmen-6"
    p1.coordinator = "10.0.0.1:9999"
    p1.num_processes = 4
    p1.process_id = 3
    p1.iparams()
    assert p1.resume_hash() == base, (
        "distributed-launch knobs must not change resume identity"
    )
    # sanity: an arch knob still changes it
    p2 = COGMENParams()
    p2.dataset = "synthetic-cogmen-6"
    p2.hidden_dim = 123
    p2.iparams()
    assert p2.resume_hash() != base


# ------------------------------------------- AutoResume sibling hash gating
class _FakeSaver:
    def latest_checkpoint(self):
        return None


class _FakeParams:
    def __init__(self, h):
        self._h = h

    def resume_hash(self):
        return self._h


class _FakeExp:
    def __init__(self, blob_dir):
        self.blob_dir = blob_dir


class _FakeTrainer:
    def __init__(self, blob_dir, h):
        self.exp = _FakeExp(blob_dir)
        self.params = _FakeParams(h)


def _mk_sibling(root, run, step, meta):
    d = os.path.join(root, run, "saver")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"checkpoint.{step:08d}.ckpt")
    with open(path, "wb") as f:
        f.write(b"x")
    if meta is not None:
        with open(path + ".json", "w") as f:
            f.write(meta)
    return path


def test_autoresume_sibling_requires_matching_hash(tmp_path):
    from erc_tpu.train.callbacks import AutoResume

    root = str(tmp_path / "exp")
    own = os.path.join(root, "run_self")
    os.makedirs(os.path.join(own, "saver"), exist_ok=True)
    tr = _FakeTrainer(own, "goodhash")

    # meta-less sibling: rejected (pre-upgrade / incompatible provenance)
    _mk_sibling(root, "run_nometa", 5, None)
    assert AutoResume._latest_sibling_checkpoint(tr) is None
    # unreadable meta: rejected
    _mk_sibling(root, "run_badmeta", 6, "{not json")
    assert AutoResume._latest_sibling_checkpoint(tr) is None
    # hash-less meta: rejected (no params_hash key)
    _mk_sibling(root, "run_nohash", 7, json.dumps({"eidx": 1}))
    assert AutoResume._latest_sibling_checkpoint(tr) is None
    # wrong hash: rejected
    _mk_sibling(root, "run_wrong", 8, json.dumps({"params_hash": "other"}))
    assert AutoResume._latest_sibling_checkpoint(tr) is None
    # matching hash: accepted
    good = _mk_sibling(root, "run_good", 9, json.dumps({"params_hash": "goodhash"}))
    assert AutoResume._latest_sibling_checkpoint(tr) == good


# ------------------------------------------------------- write-gated stores
def test_stores_write_gating(tmp_path):
    from erc_tpu.core.metrics_db import BestMetrics, MetricBoard, PredictionStore

    bm = BestMetrics(str(tmp_path / "metrics.json"), write=False)
    out = bm.update_metric("f1", 0.5)
    assert out == {"f1": 0.5}  # in-memory CAS identical on every process
    bm.flush()
    assert not os.path.exists(bm.path)

    board = MetricBoard(str(tmp_path / "board.jsonl"), write=False)
    board.append({"x": 1}, step=0)
    board.flush()
    assert not os.path.exists(board.path)
    assert board._buf == []  # buffer still drained (no unbounded growth)

    ps = PredictionStore(str(tmp_path / "pred.jsonl"), write=False)
    ps.append([1, 2])
    ps.flush()
    assert not os.path.exists(ps.path)


def test_saver_write_gating(tmp_path):
    from erc_tpu.train.checkpoint import Saver

    sv = Saver(str(tmp_path / "saver"), write=False)
    path = sv.save_checkpoint(3, {"w": np.ones(2)}, meta={"eidx": 0}, is_best=True)
    assert path.endswith("checkpoint.00000003.ckpt")  # canonical path returned
    assert os.listdir(sv.save_dir) == []
    sv.save_model("last", {"w": np.ones(2)}, is_best=True)
    assert os.listdir(sv.save_dir) == []

    # the writer really writes
    sw = Saver(str(tmp_path / "saver2"), write=True)
    p2 = sw.save_checkpoint(3, {"w": np.ones(2)}, meta={"eidx": 0})
    assert os.path.exists(p2) and os.path.exists(p2 + ".json")


# -------------------------------------------------- registry dataset_has_val
def test_dataset_has_val_grammar():
    from erc_tpu.data.registry import dataset_has_val

    assert dataset_has_val("mosei-emo-sbert-6")
    assert dataset_has_val("mosei-cim-2")
    assert dataset_has_val("iemocap-mmin-4")
    assert dataset_has_val("synthetic-mosei-6")
    assert dataset_has_val("synthetic-mmin-4")
    assert dataset_has_val("dailydialog-token-7")
    assert not dataset_has_val("iemocap-cogmen-4")
    assert not dataset_has_val("meld-mmgcn-7")
    assert not dataset_has_val("synthetic-cogmen-6")
    # corpus name appearing as a FEATURE tag must not enable a val stage
    assert not dataset_has_val("iemocap-cogmen-mosei-4")


def test_select_on_val_falls_back_on_iemocap(tmp_path):
    """--select_on=val on a val-less dataset must warn + fall back to test
    selection instead of silently disabling best-model saving entirely."""
    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer

    p = COGMENParams()
    p.dataset = "synthetic-cogmen-6"
    p.epoch = 1
    p.max_seq_len = 16
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.eval_per_epoch = 1
    p.select_on = "val"
    p.iparams()
    tr = COGMENTrainer(p)
    tr.train()
    assert tr.params.select_on == "test"
    import glob

    assert glob.glob(os.path.join(tr.saver.save_dir, "best.model.ckpt")), (
        "fallback selection did not save a best model: "
        + repr(os.listdir(tr.saver.save_dir))
    )


# ------------------------------------------------- audio augmentation port
def test_audio_crops_and_noise():
    from erc_tpu.contrib import (
        AudioCompose,
        audio_center_crop,
        audio_gauss_noise,
        audio_random_crop,
    )

    x = np.arange(100, dtype=float)
    rng = np.random.default_rng(0)

    # center crop: exact reference arithmetic (audio_strategies.py:45-52)
    c = audio_center_crop(30)(x)
    assert len(c) == 30 and c[0] == (100 - 30) // 2
    assert audio_center_crop(200)(x) is x  # short clip passes through

    # random crop: window inside bounds, correct size
    for _ in range(20):
        r = audio_random_crop(30)(x, rng)
        assert len(r) == 30 and 0 <= r[0] <= 70 and r[-1] == r[0] + 29
    assert audio_random_crop(200)(x, rng) is x

    # gauss noise: p=0 is identity; p=1 perturbs with std ~ max*ratio/100
    g0 = audio_gauss_noise(ratio=20, p=0.0)(x, rng)
    np.testing.assert_array_equal(g0, x)
    pert = audio_gauss_noise(ratio=20, p=1.0)(x, np.random.default_rng(1))
    resid = pert - x
    assert 10 < np.std(resid) < 30  # std ≈ 99*0.2 ≈ 19.8

    # Compose: ordered application, falsy entries skipped
    pipe = AudioCompose(None, audio_center_crop(50), audio_random_crop(10))
    out = pipe(x, np.random.default_rng(2))
    assert len(out) == 10 and 25 <= out[0] < 75
