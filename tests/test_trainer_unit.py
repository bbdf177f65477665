"""Trainer unit edge cases: empty masks, metric aggregation, stacking."""

import numpy as np

import jax.numpy as jnp

from erc_tpu.train.trainer import (
    _stack_batches,
    masked_accuracy,
    masked_cross_entropy,
)


def test_masked_ce_empty_mask_is_finite():
    logits = jnp.zeros((2, 3, 4))
    labels = jnp.full((2, 3), -1)
    mask = jnp.zeros((2, 3))
    assert np.isfinite(float(masked_cross_entropy(logits, labels, mask)))
    assert np.isfinite(float(masked_accuracy(logits, labels, mask)))


def test_masked_accuracy_values():
    logits = jnp.asarray([[[0.0, 1.0], [1.0, 0.0], [9.0, 0.0]]])
    labels = jnp.asarray([[1, 0, 1]])
    mask = jnp.asarray([[1.0, 1.0, 0.0]])  # third position padded
    assert float(masked_accuracy(logits, labels, mask)) == 1.0


def test_stack_batches_none_passthrough():
    b = {"x": np.ones((2, 3)), "y": None}
    s = _stack_batches([b, b])
    assert s["x"].shape == (2, 2, 3)
    assert s["y"] is None


def test_profile_steps_writes_trace(tmp_path):
    import glob
    import os

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer

    p = COGMENParams()
    p.dataset = "synthetic-cogmen-6"
    p.epoch = 1
    p.max_seq_len = 16
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.eval_per_epoch = 0
    p.profile_steps = 2
    p.iparams()
    tr = COGMENTrainer(p)
    tr.train()
    traces = glob.glob(os.path.join(tr.exp.blob_dir, "profile", "**", "*.xplane.pb"),
                       recursive=True)
    assert traces, "no xplane trace written"


def test_val_stage_on_mosei(tmp_path):
    """Base-trainer evaluate() (VERDICT r2 item 7): datasets with a real
    val split (MOSEI valid_id / reference mosei_feature.py:131-143) get a
    'val' board stage at the eval cadence, and --select_on=val saves a
    best_val model on val wF1."""
    import json
    import os

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.cim import CIMParams, CIMTrainer

    p = CIMParams()
    p.dataset = "synthetic-mosei-2"
    p.epoch = 1
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.max_seq_len = 16
    p.select_on = "val"
    p.iparams()
    tr = CIMTrainer(p)
    assert tr.dataset_has_val()
    tr.train()

    rows = [json.loads(l) for l in open(tr.exp.test_file("board.jsonl"))]
    val_rows = [r for r in rows if r.get("stage") == "val"]
    assert val_rows, "no val-stage board rows"
    assert "Lall" in val_rows[0] and "f1" in val_rows[0]
    assert "val_f1" in tr.database.todict()
    import glob

    assert glob.glob(os.path.join(tr.saver.save_dir, "*best_val*")), (
        "best_val model not saved: " + repr(os.listdir(tr.saver.save_dir))
    )


def test_no_val_stage_on_iemocap(tmp_path):
    """IEMOCAP readers alias val→test; the val stage must stay off there
    (validating would select on the test set)."""
    import os

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer

    p = COGMENParams()
    p.dataset = "synthetic-cogmen-6"
    p.iparams()
    assert not COGMENTrainer(p).dataset_has_val()
