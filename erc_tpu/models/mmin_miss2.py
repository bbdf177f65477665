"""mmin_miss2 — twin-net missing-modality training.

TPU re-design of reference track_mm/mmin_miss2.py, which is NOT a copy of
mmin_miss despite the name: there is no imagination ResidualAE and no
frozen pretrained encoder.  Two MMINBase nets train jointly under one
optimizer (mmin_miss2.py:149-152): ``net`` classifies the Missing-masked
inputs, ``netB`` the complementary (reverse) features, and the loss

    Lall = Lce(logits) + 4·Lmse(reverse_features, fusion_feature)
         + Lrce(reverse_logits)                      (mmin_miss2.py:194-208)

pulls net's penultimate classifier feature toward netB's with gradients
flowing into BOTH nets (no stop-gradient / detach in the reference).
``--pretrain_path`` warm-starts netB from a finished mmin_base run
(mmin_miss2.py:144-147) — warm-start only; netB keeps training.
Eval/test classify with ``net`` alone; EMA Acc2 likewise reads only the
net subtree (to_logits/to_ema_logits, mmin_miss2.py:165-169).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from erc_tpu.models.mmin_base import MMINBaseParams, MMINBaseTrainer
from erc_tpu.models.mmin_miss import masked_mse
from erc_tpu.models.mmin_models import MMINMiss2Module
from erc_tpu.train import optim as optim_factory
from erc_tpu.train.trainer import main as _main, masked_accuracy, masked_cross_entropy


class MMINMiss2Params(MMINBaseParams):
    def __init__(self):
        super().__init__()
        # reference default points at a finished mmin_base run
        # (mmin_miss2.py:54); None → random-init netB (still trained)
        self.pretrain_path = None


ParamsType = MMINMiss2Params


class MMINMiss2Trainer(MMINBaseTrainer):
    def has_miss(self) -> bool:
        return True

    def imodels(self, params: ParamsType):
        # one param tree holds both nets → the single optimizer is the
        # reference's chain(model.parameters(), modelB.parameters())
        self.model = MMINMiss2Module(n_classes=params.n_classes)
        self.tx = optim_factory.build_optim(params.optim)
        self.lr_sche = optim_factory.ReduceLROnPlateau(mode="min")

    def initialize(self):
        super().initialize()
        p = self.params.get("pretrain_path")
        if p and not getattr(self, "_netb_loaded", False):
            # the file is a full mmin_base TrainState checkpoint; its
            # MMINBaseModule params subtree is structurally identical to
            # this model's netB (reference loads sd['models']['model'],
            # mmin_miss2.py:145-147)
            netb = self.saver.load_params(p, self.state.params["netB"])
            new_params = dict(self.state.params)
            new_params["netB"] = netb
            self.state = self.state.replace(params=new_params)
            if self.state.ema_params is not None:
                # re-sync the shadow so EMA starts from the loaded weights
                self.state = self.state.replace(
                    ema_params=jax.tree_util.tree_map(jnp.copy, new_params)
                )
            # the loaded subtree is host numpy — re-place the whole state
            # on the mesh so the donated train step sees one sharding
            # (mirrors load_checkpoint, trainer.py:793-794)
            from erc_tpu.parallel import mesh as meshlib

            self.state = meshlib.replicate(self.state, self.mesh)
            self._netb_loaded = True
            self.logger.info(f"warm-started netB from {p}")

    def loss_and_metrics(self, variables, batch, rng, train: bool):
        mask = batch["sample_mask"]
        labels = batch["label"]
        if train and "audio_feature_reverse" in batch:
            logits, fusion, rlogits, rfeat = self.model.apply(
                variables, batch, deterministic=False,
                rngs={"dropout": rng}, with_reverse=True,
            )
            Lce = masked_cross_entropy(logits, labels, mask)
            Lrce = masked_cross_entropy(rlogits, labels, mask)
            Lmse = masked_mse(rfeat, fusion, mask)
            Lall = Lce + Lmse * 4 + Lrce
            mets = {
                "Lall": Lall, "Lce": Lce, "Lrce": Lrce, "Lmse": Lmse,
                "Acc": masked_accuracy(logits, labels, mask),
            }
        else:
            logits, _ = self.model.apply(
                variables, batch, deterministic=not train, rngs={"dropout": rng}
            )
            Lall = masked_cross_entropy(logits, labels, mask)
            mets = {"Lall": Lall, "Acc": masked_accuracy(logits, labels, mask)}
        return Lall, (mets, {})

    def to_logits(self, variables, batch):
        return self.model.apply(variables, batch, deterministic=True)[0]


main = partial(_main, MMINMiss2Trainer, MMINMiss2Params)
