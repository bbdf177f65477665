"""End-to-end: COGMEN trains on synthetic data and learns (acc ↑, f1 computed),
checkpoints round-trip, CLI dispatch works."""

import numpy as np
import pytest

from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer, pick_num_heads


def _params(tmp_path, epochs=2):
    p = COGMENParams()
    p.dataset = "synthetic-cogmen-6"
    p.epoch = epochs
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.max_seq_len = 48
    p.optim.lr = 1e-3
    import os

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    p.iparams()
    return p


def test_pick_num_heads():
    assert pick_num_heads(300, 17) == 6
    assert pick_num_heads(712, 17) == 8


def test_cogmen_dims_from_grammar():
    p = COGMENParams()
    p.dataset = "iemocap-cogmen-4"
    p.iparams()
    assert (p.hidden_audio, p.hidden_text, p.hidden_visual) == (100, 100, 512)
    assert p.hidden_all == 712
    assert p.n_classes == 4
    p2 = COGMENParams()
    p2.dataset = "iemocap-cogmen-sbert-6"
    p2.modality = "at"
    p2.iparams()
    assert p2.hidden_text == 768
    assert p2.hidden_all == 768 + 100


@pytest.mark.slow
def test_cogmen_learns_on_synthetic(tmp_path):
    p = _params(tmp_path, epochs=2)
    trainer = COGMENTrainer(p)
    trainer.train()
    res = trainer.test()
    # synthetic labels are a noisy function of features: 2 epochs must beat chance
    assert res["f1"] > 1.0 / 6 + 0.1, res["f1"]
    best = trainer.database.todict()
    assert "f1" in best and best["f1"] >= res["f1"] - 1e-9


def test_cogmen_checkpoint_roundtrip(tmp_path):
    p = _params(tmp_path, epochs=1)
    trainer = COGMENTrainer(p)
    trainer.initialize()
    path = trainer.save_checkpoint()
    import jax

    before = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    trainer.state = None
    trainer2 = COGMENTrainer(p)
    trainer2.initialize()
    trainer2.load_checkpoint(path)
    after = jax.tree_util.tree_map(np.asarray, trainer2.state.params)
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = jax.tree_util.tree_leaves(after)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)
