"""MMIN base: utterance-level tri-modal classifier with EMA.

TPU re-design of reference track_mm/mmin_base.py: TextCNN/LSTM encoders →
FC classifier; Adam 2e-4; EMA(α=0.999) updated per step inside the jit
train step; ReduceLROnPlateau on the eval loss (mmin_base.py:96-99,175).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from erc_tpu.data.loader import DialogueLoader
from erc_tpu.data.mmin import MMINBatcher, pick_mmin_datas, synthetic_mmin
from erc_tpu.models.base import MMBaseParams
from erc_tpu.models.mmin_models import MMINBaseModule
from erc_tpu.train import optim as optim_factory
from erc_tpu.train.trainer import (
    Trainer,
    main as _main,
    masked_accuracy,
    masked_cross_entropy,
)


class MMINBaseParams(MMBaseParams):
    def __init__(self):
        super().__init__()
        self.train.batch_size = 32
        self.val.batch_size = 32
        self.test.batch_size = 32
        self.num_heads = 10
        self.confuse_matrix = True
        self.dataset = "iemocap-mmin-4"
        self.epoch = 55
        self.optim = optim_factory.create_optim("Adam", lr=0.0002, weight_decay=0)
        self.ema = True
        self.ema_alpha = 0.999
        self.max_audio_len = 128
        self.pretrain_path = None


ParamsType = MMINBaseParams


class MMINBaseTrainer(Trainer):
    plateau_source = "val"  # reference steps on the eval (val) loss, not test

    def imodels(self, params: ParamsType):
        self.model = MMINBaseModule(n_classes=params.n_classes)
        self.tx = optim_factory.build_optim(params.optim)
        self.lr_sche = optim_factory.ReduceLROnPlateau(mode="min")

    # -- utterance-level data -------------------------------------------------
    def mmin_batcher(self, batch_size: int, has_miss: bool) -> MMINBatcher:
        data_axis = self.mesh.devices.shape[0]
        pad_to = -(-int(batch_size) // data_axis) * data_axis
        return MMINBatcher(
            max_audio_len=int(self.params.get("max_audio_len", 128)),
            has_miss=has_miss,
            pad_batch_to=pad_to,
            rng=self.rng.numpy_rng("missing"),
        )

    def has_miss(self) -> bool:
        return False

    def make_loader(self, split: str) -> DialogueLoader:
        p = self.params
        root = p.get("data_root") or ""
        samples = pick_mmin_datas(root, p.dataset, split=split)
        bs = int(p.train.batch_size if split == "train" else p.test.batch_size)
        return DialogueLoader(
            samples,
            self.mmin_batcher(bs, has_miss=(split == "train" and self.has_miss())),
            batch_size=bs,
            shuffle=(split == "train"),
            seed=p.seed,
            sort_by_length=False,
        )

    def example_batch(self, L: int = 32, B: int = 2):
        samples = synthetic_mmin(self.params.n_classes, "train", n_train=B)
        return self.mmin_batcher(B, self.has_miss())(samples)

    # -- loss with sample mask + EMA update in the jit step -------------------
    def loss_and_metrics(self, variables, batch, rng, train: bool):
        logits, _ = self.model.apply(
            variables, batch, deterministic=not train, rngs={"dropout": rng}
        )
        mask = batch["sample_mask"]
        loss = masked_cross_entropy(logits, batch["label"], mask)
        return loss, ({"Lall": loss, "Acc": masked_accuracy(logits, batch["label"], mask)}, {})

    def _make_raw_train_step(self):
        """EMA update composed into the raw step, so BOTH the single-step
        jit and the steps_per_call multi-step scan maintain the shadow."""
        raw_step = super()._make_raw_train_step()
        if not self.params.get("ema", True):
            return raw_step
        alpha = float(self.params.get("ema_alpha", 0.999))

        def step_with_ema(state, batch, key):
            new_state, mets = raw_step(state, batch, key)
            ema = state.ema_params if state.ema_params is not None else state.params
            new_ema = jax.tree_util.tree_map(
                lambda e, p: alpha * e + (1 - alpha) * p, ema, new_state.params
            )
            return new_state.replace(ema_params=new_ema), mets

        return step_with_ema

    def _build_step_fns(self):
        super()._build_step_fns()
        if not self.params.get("ema", True):
            return

        # eval returns (raw, ema) logits in one dispatch: the reference
        # evaluates the EMA shadow at every test/eval step and reports Acc2
        # (mmin_base.py:104-120,158-159)
        def eval_step_ema(state, batch):
            variables = {"params": state.params, **state.model_state}
            raw = self.to_logits(variables, batch)
            ev = {"params": state.ema_params, **state.model_state}
            return raw, self.to_logits(ev, batch)

        # through the installer so the scanned multi-eval path (K batches
        # per dispatch) also returns the EMA pair
        self._install_eval_step(eval_step_ema)

    def initialize(self):
        super().initialize()
        if self.params.get("ema", True) and self.state.ema_params is None:
            # distinct buffers: the train step donates its input, and the
            # same buffer cannot be donated through two pytree fields
            self.state = self.state.replace(
                ema_params=jax.tree_util.tree_map(jnp.copy, self.state.params)
            )

    def to_logits(self, variables, batch):
        logits, _ = self.model.apply(variables, batch, deterministic=True)
        return logits

    def test_step_collect(self, batch, logits):
        from erc_tpu.parallel import mesh as meshlib

        ema_logits = None
        if isinstance(logits, tuple):
            logits, ema_logits = logits
        mask, labels, logits, ema_logits = meshlib.fetch_local(
            [batch["sample_mask"], batch["label"], logits, ema_logits]
        )
        mask = np.asarray(mask) > 0
        labels = np.asarray(labels)
        logits = np.asarray(logits)
        pred = logits.argmax(-1)
        sel = mask & (labels >= 0)
        self._true.extend(labels[sel].tolist())
        self._pred.extend(pred[sel].tolist())
        self._collect_nll(logits, labels, sel)
        if ema_logits is not None:
            ema_pred = np.asarray(ema_logits).argmax(-1)
            self._ema_hits += int(((ema_pred == labels) & sel).sum())
            self._ema_n += int(sel.sum())

    def on_test_begin(self):
        self._ema_hits, self._ema_n = 0, 0

    def on_test_end(self, res):
        if jax.process_count() > 1:
            from erc_tpu.parallel import mesh as meshlib

            h, n = meshlib.allsum(self._ema_hits, self._ema_n)
            self._ema_hits, self._ema_n = int(h), int(n)
        if self._ema_n:
            res["Acc2"] = self._ema_hits / self._ema_n
            self.logger.info(f"EMA Acc2: {res['Acc2']:.5f}")

    # -- val stage: the base Trainer.evaluate() runs at the eval cadence
    # (dataset_has_val → MMIN folds) and steps ReduceLROnPlateau on the val
    # loss via plateau_source = "val" (reference mmin_base.py:171-176);
    # eval-stage hooks reuse the test-stage EMA collectors
    def on_eval_begin(self):
        self.on_test_begin()

    def on_eval_end(self, res):
        self.on_test_end(res)  # adds EMA Acc2 to the val row


main = partial(_main, MMINBaseTrainer, MMINBaseParams)
