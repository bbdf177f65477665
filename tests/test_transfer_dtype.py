"""--transfer_dtype=bfloat16: the input pipeline quantizes f32 batch
arrays before host→device transfer (halving the bytes a tunnel/PCIe link
ships per step) and the jitted steps upcast to compute precision at entry
(trainer.cast_floats), so transfer precision and compute precision are
independent knobs.  Measured end-to-end effect is in BENCH_MATRIX.md; the
tests here pin the semantics."""

import os

import numpy as np
import pytest


def test_transfer_cast_fn_quantizes_only_f32():
    from erc_tpu.data.loader import transfer_cast_fn

    assert transfer_cast_fn("float32") is None
    assert transfer_cast_fn(None) is None
    cast = transfer_cast_fn("bfloat16")
    import ml_dtypes

    batch = {
        "text_feature": np.ones((2, 4, 8), np.float32),
        "label": np.ones((2, 4), np.int64),
        "mask_bool": np.ones((2, 4), bool),
        "none_key": None,
    }
    out = cast(batch)
    assert out["text_feature"].dtype == np.dtype(ml_dtypes.bfloat16)
    assert out["label"].dtype == np.int64  # ints pass through
    assert out["mask_bool"].dtype == bool
    assert out["none_key"] is None
    # original batch untouched (no in-place mutation)
    assert batch["text_feature"].dtype == np.float32


def test_step_entry_upcast_keeps_compute_f32():
    """A bf16-transferred batch trains within quantization noise of the
    f32-transferred run (the step upcasts at entry — the only difference
    is one bf16 rounding of the input features)."""
    import jax.numpy as jnp

    from erc_tpu.data.loader import transfer_cast_fn
    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer
    from erc_tpu.parallel import mesh as meshlib

    p = COGMENParams()
    p.dataset = "synthetic-cogmen-6"
    p.max_seq_len = 16
    p.train.batch_size = 8
    p.iparams()
    tr = COGMENTrainer(p)
    tr.initialize()
    tr._build_step_fns()
    batch = tr.example_batch(L=16, B=8)
    cast = transfer_cast_fn("bfloat16")

    tr2 = COGMENTrainer(p)
    tr2.initialize()
    tr2._build_step_fns()
    sharded16 = meshlib.shard_batch(cast(batch), tr2.mesh)

    # eval path first (the train step donates/consumes its input state):
    # same seed → identical initial params; the only difference is one
    # bf16 rounding of the input features
    l32 = np.asarray(tr._eval_fn(tr.state, meshlib.shard_batch(batch, tr.mesh)))
    l16 = np.asarray(tr2._eval_fn(tr2.state, sharded16))
    assert np.isfinite(l16).all()
    np.testing.assert_allclose(l16, l32, atol=0.05)

    _, mets32 = tr._train_step_fn(tr.state, meshlib.shard_batch(batch, tr.mesh),
                                  tr.rng.key("d", 0))
    loss32 = float(np.asarray(mets32["Lall"]))

    state16, mets16 = tr2._train_step_fn(tr2.state, sharded16, tr2.rng.key("d", 0))
    loss16 = float(np.asarray(mets16["Lall"]))
    assert np.isfinite(loss16)
    assert loss16 == pytest.approx(loss32, rel=0.02)
    # master params still f32 after a bf16-input step
    import jax

    for leaf in jax.tree_util.tree_leaves(state16.params):
        assert leaf.dtype == jnp.float32


def test_transfer_dtype_full_loop(tmp_path):
    """The real train() loop (MappedLoader under grouping/prefetch, eval
    stage included) runs end-to-end with --transfer_dtype=bfloat16."""
    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer

    p = COGMENParams()
    p.dataset = "synthetic-cogmen-6"
    p.epoch = 1
    p.max_seq_len = 16
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.steps_per_call = 2
    p.transfer_dtype = "bfloat16"
    p.heartbeat = False
    p.iparams()
    tr = COGMENTrainer(p)
    tr.train()
    assert tr.global_steps > 0
    best = tr.database.todict()
    assert np.isfinite(best.get("f1", np.nan))
