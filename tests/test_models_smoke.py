"""Smoke tests: every model family initializes, runs one jit train step on
tiny synthetic batches, and produces finite loss + correct logit shapes."""

import numpy as np
import pytest

import jax

from erc_tpu.train.trainer import Trainer


def _run_one_step(trainer_cls, params, tmp_path):
    import os

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    params.dataset = params.dataset  # ensure set
    params.iparams()
    tr = trainer_cls(params)
    tr.initialize()
    tr._build_step_fns()
    # varied lengths: padded rows must not poison gradients (the MMGCN
    # arccos/rsqrt NaN-grad bug only shows with zero-padded rows)
    from erc_tpu.data.synthetic import synthetic_erc
    from erc_tpu.parallel import mesh as meshlib

    p = params
    samples = synthetic_erc(
        "custom", p.n_classes, "train", n_train=8, min_len=5, max_len=16,
        text_dim=p.hidden_text, audio_dim=p.hidden_audio, visual_dim=p.hidden_visual,
    )
    for s in samples:
        s["speakers"] = [
            np.eye(max(p.n_speakers, 1), dtype=int)[i % max(p.n_speakers, 1)].tolist()
            for i in range(len(s["label"]))
        ]
    batch = tr.batcher(8)(samples)
    sharded = meshlib.shard_batch(batch, tr.mesh)
    state, mets = tr._train_step_fn(tr.state, sharded, tr.rng.key("dropout", 0))
    loss = float(np.asarray(mets["Lall"]))
    gnorm = float(np.asarray(mets["gnorm"]))
    assert np.isfinite(loss), loss
    assert np.isfinite(gnorm), f"non-finite gradients (gnorm={gnorm})"
    tr.state = state
    logits = tr._eval_fn(tr.state, sharded)
    return tr, loss, logits


def test_dgcn_smoke(tmp_path):
    from erc_tpu.models.dgcn import DGCNParams, DGCNTrainer

    p = DGCNParams()
    p.dataset = "synthetic-cogmen-6"
    p.max_seq_len = 16
    tr, loss, logits = _run_one_step(DGCNTrainer, p, tmp_path)
    assert logits.shape == (8, 16, 6)
    assert tr.class_weights is not None


def test_mmgcn_smoke(tmp_path):
    from erc_tpu.models.mmgcn import MMGCNParams, MMGCNTrainer

    p = MMGCNParams()
    p.dataset = "synthetic-cogmen-6"
    p.max_seq_len = 16
    p.gcn_layers = 2  # keep the smoke test fast; 64 in production
    tr, loss, logits = _run_one_step(MMGCNTrainer, p, tmp_path)
    assert logits.shape == (8, 16, 6)


def test_mmgcn_modality_subset(tmp_path):
    from erc_tpu.models.mmgcn import MMGCNParams, MMGCNTrainer

    p = MMGCNParams()
    p.dataset = "synthetic-cogmen-6"
    p.max_seq_len = 16
    p.modality = "at"
    p.gcn_layers = 2
    tr, loss, logits = _run_one_step(MMGCNTrainer, p, tmp_path)
    assert logits.shape == (8, 16, 6)


def test_dagerc_smoke(tmp_path):
    from erc_tpu.models.dagerc import DAGERCParams, DAGERCTrainer

    p = DAGERCParams()
    p.dataset = "synthetic-cogmen-6"
    p.max_seq_len = 16
    p.hidden_dim = 32  # compile speed; production default 300
    p.gnn_layers = 2
    tr, loss, logits = _run_one_step(DAGERCTrainer, p, tmp_path)
    assert logits.shape == (8, 16, 6)


def test_dagerc_nodal_att_smoke(tmp_path):
    # --nodal_att_type=global: the reference capability beyond the
    # reimplement default (dagerc_models.py:425-466); finite loss/grads
    from erc_tpu.models.dagerc import DAGERCParams, DAGERCTrainer

    p = DAGERCParams()
    p.dataset = "synthetic-cogmen-6"
    p.max_seq_len = 16
    p.hidden_dim = 32
    p.gnn_layers = 2
    p.nodal_att_type = "global"
    tr, loss, logits = _run_one_step(DAGERCTrainer, p, tmp_path)
    assert logits.shape == (8, 16, 6)


def test_dagerc_reimplement_hparams():
    from erc_tpu.models.dagerc import DAGERCParams

    p = DAGERCParams()
    p.dataset = "iemocap-cogmen-6"
    p.reimplement = True
    p.iparams()
    assert p.dropout == 0.2 and p.epoch == 55
    assert p.train.batch_size == 16 and abs(p.optim.lr - 0.0005) < 1e-12


def test_cim_smoke(tmp_path):
    from erc_tpu.models.cim import CIMParams, CIMTrainer

    p = CIMParams()
    p.dataset = "synthetic-cogmen-6"
    p.max_seq_len = 16
    tr, loss, logits = _run_one_step(CIMTrainer, p, tmp_path)
    logits2, logits7 = logits
    assert logits2.shape == (8, 16, 6)
    assert logits7.shape == (8, 16, 7)


def test_cim_mosei_multitask(tmp_path):
    from erc_tpu.models.cim import CIMParams, CIMTrainer
    import os

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    p = CIMParams()
    p.dataset = "synthetic-mosei-2"
    p.epoch = 1
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.max_seq_len = 16
    p.iparams()
    assert p.apply_multi is True
    assert p.mosei_metric == "multiemo"
    tr = CIMTrainer(p)
    tr.train()
    res = tr.test()
    assert "f1" in res


def test_cogmen_mosei_smoke(tmp_path):
    """cogmen_mosei alias trains end-to-end on a synthetic MOSEI dataset
    (single speaker, sentiment labels)."""
    import os

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.cogmen_mosei import COGMENMoseiParams
    from erc_tpu.models.cogmen import COGMENTrainer

    p = COGMENMoseiParams()
    p.dataset = "synthetic-mosei-2"
    p.epoch = 1
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.max_seq_len = 16
    p.eval_per_epoch = 1
    p.iparams()
    assert p.n_speakers == 1
    tr = COGMENTrainer(p)
    tr.train()
    res = tr.test()
    assert "f1" in res and tr.global_steps > 0
