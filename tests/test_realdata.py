"""Ready-to-fire real-data parity gate (VERDICT r3 item 7).

Skipped unless ERC_TPU_DATA_ROOT points at the licensed IEMOCAP feature
dumps (the COGMEN 4-class pickle).  The day the dumps are mounted, the
reference's published bar (wF1 0.8113 on IEMOCAP-4,
/root/reference/track_mm/cogmen.py:6-14) is reproduced with:

    ERC_TPU_DATA_ROOT=/path/to/dumps python -m pytest -m realdata tests/ -q

or as a plain CLI run:

    python train_mm.py --module=cogmen --dataset=iemocap-cogmen-4

(the COGMEN defaults ARE the reimplement config: 55 epochs, Adam 1e-4,
weight decay 1e-8 — cogmen.py:38-42).
"""

import os

import pytest

pytestmark = pytest.mark.realdata

_ROOT = os.environ.get("ERC_TPU_DATA_ROOT", "")
_DUMP = os.path.join(_ROOT, "iemocap", "cogmen/iemocap_4/IEMOCAP_features_4.pkl")


_DUMP6 = os.path.join(_ROOT, "iemocap", "cogmen/iemocap/IEMOCAP_features.pkl")


def _run_cogmen(tmp_path, dataset):
    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer

    p = COGMENParams()
    p.dataset = dataset
    p.iparams()
    tr = COGMENTrainer(p)
    tr.train()
    return tr.database.todict()


@pytest.mark.skipif(
    not (_ROOT and os.path.exists(_DUMP)),
    reason="real IEMOCAP dumps not mounted (set ERC_TPU_DATA_ROOT)",
)
def test_cogmen_iemocap4_wf1(tmp_path):
    best = _run_cogmen(tmp_path, "iemocap-cogmen-4")
    # reference bar: wF1 0.8113 (cogmen.py:6); allow 1pt of seed variance
    assert best.get("f1", 0.0) >= 0.80, best


@pytest.mark.skipif(
    not (_ROOT and os.path.exists(_DUMP6)),
    reason="real IEMOCAP-6 dumps not mounted (set ERC_TPU_DATA_ROOT)",
)
def test_cogmen_iemocap6_wf1(tmp_path):
    best = _run_cogmen(tmp_path, "iemocap-cogmen-6")
    # reference bar: wF1 0.6112 (cogmen.py:12); allow 2pt of seed variance
    # (6-way runs are noisier — the reference's own macro/weighted spread)
    assert best.get("f1", 0.0) >= 0.59, best
