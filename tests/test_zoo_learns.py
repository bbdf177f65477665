"""Zoo-wide learns-on-synthetic e2e tests (VERDICT r3 item 1b).

Every runnable family trains a few epochs on its synthetic dataset
(class-prototype features + noise — a real, learnable signal) and must
beat chance f1 by a stated margin, mirroring
test_cogmen_e2e.py::test_cogmen_learns_on_synthetic.  This is the
quality-at-convergence net the reference only has as
reimplementation-parity-by-eye (SURVEY §4).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _train_and_score(trainer_cls, p, tmp_path):
    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    p.iparams()
    tr = trainer_cls(p)
    tr.train()
    res = tr.test()
    return tr, res


def test_dagerc_learns(tmp_path):
    from erc_tpu.models.dagerc import DAGERCParams, DAGERCTrainer

    p = DAGERCParams()
    p.dataset = "synthetic-cogmen-6"
    p.epoch = 2
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.max_seq_len = 48
    p.hidden_dim = 64   # compile speed; production 300
    p.gnn_layers = 2
    p.optim.lr = 1e-3
    _, res = _train_and_score(DAGERCTrainer, p, tmp_path)
    assert res["f1"] > 1.0 / 6 + 0.1, res["f1"]


def test_mmgcn_learns(tmp_path):
    from erc_tpu.models.mmgcn import MMGCNParams, MMGCNTrainer

    p = MMGCNParams()
    p.dataset = "synthetic-cogmen-6"
    p.epoch = 2
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.max_seq_len = 48
    p.gcn_layers = 4    # compile speed; production 64
    p.optim.lr = 1e-3
    _, res = _train_and_score(MMGCNTrainer, p, tmp_path)
    assert res["f1"] > 1.0 / 6 + 0.1, res["f1"]


def test_dgcn_learns(tmp_path):
    from erc_tpu.models.dgcn import DGCNParams, DGCNTrainer

    p = DGCNParams()
    p.dataset = "synthetic-cogmen-6"
    p.epoch = 2
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.max_seq_len = 48
    p.optim.lr = 1e-3
    _, res = _train_and_score(DGCNTrainer, p, tmp_path)
    assert res["f1"] > 1.0 / 6 + 0.1, res["f1"]


def test_dgcnv2_learns(tmp_path):
    from erc_tpu.models.dgcnv2 import DGCNV2Params, DGCNV2Trainer

    p = DGCNV2Params()
    p.dataset = "synthetic-cogmen-6"
    p.epoch = 4
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.max_seq_len = 48
    p.optim.lr = 1e-3
    _, res = _train_and_score(DGCNV2Trainer, p, tmp_path)
    assert res["f1"] > 1.0 / 6 + 0.1, res["f1"]


def test_cim_learns(tmp_path):
    from erc_tpu.models.cim import CIMParams, CIMTrainer

    p = CIMParams()
    p.dataset = "synthetic-cogmen-6"
    p.epoch = 2
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.max_seq_len = 48
    p.optim.lr = 1e-3
    _, res = _train_and_score(CIMTrainer, p, tmp_path)
    assert res["f1"] > 1.0 / 6 + 0.1, res["f1"]


def test_mmin_miss_learns(tmp_path):
    from erc_tpu.models.mmin_miss import MMINMissParams, MMINMissTrainer

    p = MMINMissParams()
    p.dataset = "synthetic-mmin-4"
    p.epoch = 3
    p.train.batch_size = 32
    p.test.batch_size = 32
    p.optim.lr = 1e-3
    _, res = _train_and_score(MMINMissTrainer, p, tmp_path)
    # utterance-level 4-class; chance 0.25.  Missing-modality dropout makes
    # this harder than the dialogue tracks, hence the smaller margin.
    assert res["f1"] > 0.25 + 0.08, res["f1"]


def test_mmin_base_learns(tmp_path):
    from erc_tpu.models.mmin_base import MMINBaseParams, MMINBaseTrainer

    p = MMINBaseParams()
    p.dataset = "synthetic-mmin-4"
    p.epoch = 3
    p.train.batch_size = 32
    p.test.batch_size = 32
    p.optim.lr = 1e-3
    _, res = _train_and_score(MMINBaseTrainer, p, tmp_path)
    # full-modality base net: no Missing dropout, so the bar matches the
    # dialogue tracks rather than the degraded miss variants
    assert res["f1"] > 0.25 + 0.10, res["f1"]


def test_mmin_miss2_learns(tmp_path):
    from erc_tpu.models.mmin_miss2 import MMINMiss2Params, MMINMiss2Trainer

    p = MMINMiss2Params()
    p.dataset = "synthetic-mmin-4"
    p.epoch = 3
    p.train.batch_size = 32
    p.test.batch_size = 32
    p.optim.lr = 1e-3
    _, res = _train_and_score(MMINMiss2Trainer, p, tmp_path)
    # twin-net feature matching (mmin_miss2.py:194-208); same bar as miss
    assert res["f1"] > 0.25 + 0.08, res["f1"]


def test_dgcnv2_daily_learns(tmp_path):
    from erc_tpu.models.dgcnv2 import DGCNV2DailyParams, DGCNV2DailyTrainer

    p = DGCNV2DailyParams()
    p.dataset = "synthetic-daily-token-7"
    # the from-scratch TextCNN embedding learns slowly on token data; a
    # small vocab (dense label bands) + 96 dialogues converges in ~10
    # epochs (measured f1≈0.55 at these settings)
    p.epoch = 10
    p.vocab_size = 50
    p.synthetic_n_train = 96
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.optim.lr = 1e-3
    _, res = _train_and_score(DGCNV2DailyTrainer, p, tmp_path)
    # token track: label-correlated vocab bands (data/synthetic.py)
    assert res["f1"] > 1.0 / 7 + 0.1, res["f1"]
