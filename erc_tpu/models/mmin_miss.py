"""MMIN missing-modality imagination training.

TPU re-design of reference track_mm/mmin_miss.py: the ``Missing`` transform
randomly zeroes one of 6 modality patterns per utterance (train only); the
MMINMiss model imagines the missing-modality encoding through a ResidualAE
whose latent feeds the classifier; a frozen pretrained MMINBase encoder
provides the reverse-feature regression target.

Loss (mmin_miss.py:205-215):  Lce + 4·Lmse(reverse_enc, fusion) +
2·Lcycle(features, fusion_cycle).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from erc_tpu.models.mmin_base import MMINBaseParams, MMINBaseTrainer
from erc_tpu.models.mmin_models import MMINBaseModule, MMINMissModule
from erc_tpu.train import optim as optim_factory
from erc_tpu.train.trainer import main as _main, masked_accuracy, masked_cross_entropy


class MMINMissParams(MMINBaseParams):
    def __init__(self):
        super().__init__()
        # reference default points at a finished mmin_base run
        # (mmin_miss.py:55); None → random-init pretrained encoder
        self.pretrain_path = None
        self.finetune = False


ParamsType = MMINMissParams


def masked_mse(a, b, mask):
    per = ((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2).mean(-1)
    mask = mask.astype(jnp.float32)
    return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)


class MMINMissTrainer(MMINBaseTrainer):
    def has_miss(self) -> bool:
        return True

    def imodels(self, params: ParamsType):
        self.model = MMINMissModule(n_classes=params.n_classes)
        self.pretrained_model = MMINBaseModule(n_classes=params.n_classes)
        self.tx = optim_factory.build_optim(params.optim)
        self.lr_sche = optim_factory.ReduceLROnPlateau(mode="min")

    def initialize(self):
        super().initialize()
        if getattr(self, "pretrained_params", None) is None:
            batch = self.example_batch()
            variables = self.pretrained_model.init(
                {"params": self.rng.key("pretrain_init")}, batch, deterministic=True
            )
            self.pretrained_params = variables["params"]
            p = self.params.get("pretrain_path")
            if p:
                # the file is a full mmin_base TrainState checkpoint;
                # extract the weights subtree (mmin_miss.py:145-146 loads
                # sd['models']['model'] the same way)
                self.pretrained_params = self.saver.load_params(
                    p, self.pretrained_params
                )
                self.logger.info(f"loaded pretrained encoder from {p}")

    def loss_and_metrics(self, variables, batch, rng, train: bool):
        logits, fusion, fusion_cycle, features = self.model.apply(
            variables, batch, deterministic=not train, rngs={"dropout": rng}
        )
        mask = batch["sample_mask"]
        Lce = masked_cross_entropy(logits, batch["label"], mask)
        mets = {"Lce": Lce, "Acc": masked_accuracy(logits, batch["label"], mask)}
        Lall = Lce
        if train and "audio_feature_reverse" in batch:
            rev_batch = {
                "audio_feature": batch["audio_feature_reverse"],
                "visual_feature": batch["visual_feature_reverse"],
                "text_feature": batch["text_feature_reverse"],
            }
            reverse_features = self.pretrained_model.apply(
                {"params": self.pretrained_params},
                rev_batch,
                deterministic=True,
                method=self.pretrained_model.encode,
            )
            reverse_features = jax.lax.stop_gradient(reverse_features)
            Lmse = masked_mse(reverse_features, fusion, mask)
            Lcycle = masked_mse(features, fusion_cycle, mask)
            Lall = Lce + Lmse * 4 + Lcycle * 2
            mets.update(Lmse=Lmse, Lcycle=Lcycle)
        mets["Lall"] = Lall
        return Lall, (mets, {})

    def to_logits(self, variables, batch):
        return self.model.apply(variables, batch, deterministic=True)[0]


main = partial(_main, MMINMissTrainer, MMINMissParams)
