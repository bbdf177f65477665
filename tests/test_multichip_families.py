"""Per-family multi-device correctness (VERDICT r3 item 4): each risk
family's full train step jitted over an 8-virtual-device DP mesh must
produce the SAME loss trajectory as a 1-device run — sharding the batch is
a layout change, not a math change.  Covers the scan/EMA hazard surface:
DAG-ERC blockwise-prefix scan, MMGCN GCNII layer scan, DialogueRNN nested
scan (dgcnv2), MMIN EMA-in-jit.
"""

import os

import numpy as np
import pytest

import jax

from erc_tpu.parallel import mesh as meshlib

pytestmark = pytest.mark.slow


def _two_step_losses(trainer_cls, p, spec, tmp_path, n_steps=2):
    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    tr = trainer_cls(p)
    ndev = spec.data * spec.model
    tr.mesh = meshlib.make_mesh(spec, jax.devices()[:ndev])
    tr.initialize()
    tr._build_step_fns()
    batch = tr.example_batch(L=16, B=8)
    sharded = meshlib.shard_batch(batch, tr.mesh)
    state, losses = tr.state, []
    for i in range(n_steps):
        state, mets = tr._train_step_fn(state, sharded, tr.rng.key("mc", i))
        losses.append(float(np.asarray(mets["Lall"])))
    return losses


def _check_family(trainer_cls, p, tmp_path):
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.max_seq_len = 16
    p.length_bucket = 8
    p.iparams()
    ref = _two_step_losses(trainer_cls, p, meshlib.MeshSpec(data=1, model=1), tmp_path)
    dp8 = _two_step_losses(trainer_cls, p, meshlib.MeshSpec(data=8, model=1), tmp_path)
    dp4tp2 = _two_step_losses(trainer_cls, p, meshlib.MeshSpec(data=4, model=2), tmp_path)
    assert all(np.isfinite(ref)), ref
    np.testing.assert_allclose(dp8, ref, rtol=2e-5, atol=2e-6,
                               err_msg="8x1 DP diverges from 1-device")
    np.testing.assert_allclose(dp4tp2, ref, rtol=2e-5, atol=2e-6,
                               err_msg="4x2 DPxTP diverges from 1-device")


def test_cogmen_multichip_loss_equality(tmp_path):
    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer

    p = COGMENParams()
    p.dataset = "synthetic-cogmen-6"
    _check_family(COGMENTrainer, p, tmp_path)


def test_dagerc_multichip_loss_equality(tmp_path):
    from erc_tpu.models.dagerc import DAGERCParams, DAGERCTrainer

    p = DAGERCParams()
    p.dataset = "synthetic-cogmen-6"
    p.hidden_dim = 32
    p.gnn_layers = 2
    _check_family(DAGERCTrainer, p, tmp_path)


def test_mmgcn_multichip_loss_equality(tmp_path):
    from erc_tpu.models.mmgcn import MMGCNParams, MMGCNTrainer

    p = MMGCNParams()
    p.dataset = "synthetic-cogmen-6"
    p.gcn_layers = 4
    _check_family(MMGCNTrainer, p, tmp_path)


def test_dgcnv2_multichip_loss_equality(tmp_path):
    from erc_tpu.models.dgcnv2 import DGCNV2Params, DGCNV2Trainer

    p = DGCNV2Params()
    p.dataset = "synthetic-cogmen-6"
    _check_family(DGCNV2Trainer, p, tmp_path)


def test_mmin_miss_multichip_loss_equality(tmp_path):
    from erc_tpu.models.mmin_miss import MMINMissParams, MMINMissTrainer

    p = MMINMissParams()
    p.dataset = "synthetic-mmin-4"
    _check_family(MMINMissTrainer, p, tmp_path)


def test_cim_multichip_loss_equality(tmp_path):
    """CIM's hazard is the three fused-bidirectional GRU scan chains plus
    the CE+BCE multitask loss (two masked reductions that must psum
    identically)."""
    from erc_tpu.models.cim import CIMParams, CIMTrainer

    p = CIMParams()
    p.dataset = "synthetic-cogmen-6"
    _check_family(CIMTrainer, p, tmp_path)


def test_dgcn_multichip_loss_equality(tmp_path):
    """DGCN's hazard is the packed biLSTM scan (length-masked reverse
    direction) and the class-frequency loss weights computed from the
    sharded batch's label histogram."""
    from erc_tpu.models.dgcn import DGCNParams, DGCNTrainer

    p = DGCNParams()
    p.dataset = "synthetic-cogmen-6"
    _check_family(DGCNTrainer, p, tmp_path)


def test_mmin_miss2_multichip_loss_equality(tmp_path):
    """miss2 trains TWO MMINBase nets jointly in one param tree — both
    nets' grads must psum coherently on the data axis."""
    from erc_tpu.models.mmin_miss2 import MMINMiss2Params, MMINMiss2Trainer

    p = MMINMiss2Params()
    p.dataset = "synthetic-mmin-4"
    _check_family(MMINMiss2Trainer, p, tmp_path)


def test_dgcnv2_daily_multichip_loss_equality(tmp_path):
    """The token track's hazard is the embedding table: a [vocab, D]
    gather in forward and a scatter-add gradient in backward that must
    psum coherently over the data axis."""
    from erc_tpu.models.dgcnv2 import DGCNV2DailyParams, DGCNV2DailyTrainer

    p = DGCNV2DailyParams()
    p.dataset = "synthetic-daily-token-7"
    p.vocab_size = 500
    p.n_words = 12
    p.embedding_dim = 32
    p.hidden_size = 16
    _check_family(DGCNV2DailyTrainer, p, tmp_path)


def test_mmin_base_multichip_loss_equality(tmp_path):
    """mmin_base is the EMA-in-jit origin (miss/miss2 inherit it); its own
    step must shard cleanly too — utterance-level batch keys differ from
    the dialogue families."""
    from erc_tpu.models.mmin_base import MMINBaseParams, MMINBaseTrainer

    p = MMINBaseParams()
    p.dataset = "synthetic-mmin-4"
    _check_family(MMINBaseTrainer, p, tmp_path)


def test_mmin_ema_shadow_consistent_across_mesh(tmp_path):
    """The EMA shadow (updated INSIDE the jit step) must come out identical
    on a sharded mesh — a desynced shadow would silently corrupt Acc2 eval."""
    from erc_tpu.models.mmin_miss import MMINMissParams, MMINMissTrainer

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)

    def run(spec):
        p = MMINMissParams()
        p.dataset = "synthetic-mmin-4"
        p.train.batch_size = 8
        p.test.batch_size = 8
        p.iparams()
        tr = MMINMissTrainer(p)
        ndev = spec.data * spec.model
        tr.mesh = meshlib.make_mesh(spec, jax.devices()[:ndev])
        tr.initialize()
        tr._build_step_fns()
        batch = tr.example_batch(L=16, B=8)
        sharded = meshlib.shard_batch(batch, tr.mesh)
        state = tr.state
        for i in range(2):
            state, _ = tr._train_step_fn(state, sharded, tr.rng.key("ema", i))
        return jax.tree_util.tree_map(np.asarray, state.ema_params)

    e1 = run(meshlib.MeshSpec(data=1, model=1))
    e8 = run(meshlib.MeshSpec(data=8, model=1))
    for a, b in zip(jax.tree_util.tree_leaves(e1), jax.tree_util.tree_leaves(e8)):
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6)
