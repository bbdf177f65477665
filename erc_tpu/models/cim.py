"""CIM: contextual inter-modal attention with dual heads.

TPU re-design of reference track_mm/cim.py: per-modality biGRU →
adapter MLPs → 6 pairwise cross-modal attention products (masked softmax,
cim.py:108-115) → concat(9×100) → binary-sentiment head + 7-way
multi-label emotion head; multitask CE + BCE loss (cim.py:198-229).
MOSEI eval reports the multilabel @0.5 block (mmbase.py:277-296).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from erc_tpu.models.base import MMBaseParams
from erc_tpu.ops.rnn import BiRNN
from erc_tpu.train import metrics as metrics_mod
from erc_tpu.train import optim as optim_factory
from erc_tpu.train.trainer import (
    Trainer,
    main as _main,
    masked_accuracy,
    masked_cross_entropy,
)


class CIMParams(MMBaseParams):
    def __init__(self):
        super().__init__()
        self.train.batch_size = 16
        self.val.batch_size = 32
        self.test.batch_size = 32
        self.num_heads = 17
        self.dataset = "iemocap-cogmen-6"
        self.epoch = 55
        self.optim = optim_factory.create_optim("Adam", lr=0.001)
        self.apply_multi = True
        self.apply_bin = True
        self.metric = "multiemo"
        self.hidden_size = 200
        # one fused scan for the three modality biGRUs — wins only in the
        # latency-bound small-batch regime (measured B=32 +16.8% train but
        # B=64/128 −6..−13%, BENCH_MATRIX CIM section), so 'auto' resolves
        # from batch size; 'on'/'off' force it
        self.fused_rnn = "auto"

    def iparams(self):
        super().iparams()
        if "mosei" not in self.dataset:
            self.apply_multi = False
        if self.n_classes != 2:
            self.mosei_metric = ""


ParamsType = CIMParams


class CIMModule(nn.Module):
    text_dim: int
    audio_dim: int
    visual_dim: int
    hidden_size: int
    n_classes: int
    drop0: float = 0.3
    drop1: float = 0.3
    # run the three modality biGRUs as ONE scan (6 direction-chains on the
    # batch axis): 1/3 the sequential steps — wins in the latency-bound
    # small-batch regime, loses once per-step matmuls are wide (see
    # resolve_fused_rnn for the measured crossover).  Same math, same
    # param tree either way.
    fused_rnn: bool = True

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        mask = batch["attention_mask"]

        def drop(t, rate):
            if not deterministic and rate > 0:
                return nn.Dropout(rate)(t, deterministic=False)
            return t

        modalities = (("a", "audio_feature"), ("v", "visual_feature"), ("t", "text_feature"))
        encoded = {}
        if self.fused_rnn:
            from erc_tpu.ops.rnn import _scan_multichain

            parts = [
                BiRNN(
                    hidden_size=self.hidden_size, num_layers=1, cell="gru",
                    bidirectional=True, name=f"rnn_{m}",
                )(batch[key], mask, deterministic=deterministic, return_parts=True)
                for m, key in modalities
            ]
            for (m, _), (y_f, y_b) in zip(
                modalities, _scan_multichain(parts, mask, lstm=False)
            ):
                encoded[m] = jnp.concatenate([y_f, y_b], -1)
        else:
            for m, key in modalities:
                encoded[m] = BiRNN(
                    hidden_size=self.hidden_size, num_layers=1, cell="gru",
                    bidirectional=True, name=f"rnn_{m}",
                )(batch[key], mask, deterministic=deterministic)

        dense = {}
        for m, _ in modalities:
            h = drop(encoded[m], self.drop0)
            h = nn.relu(nn.Dense(100, name=f"adapter_{m}")(h))
            dense[m] = drop(h, self.drop1)

        def attention_op(x, y):
            # (cim.py:108-115): additive -10000 mask, softmax over keys
            m_dash = jnp.einsum("bld,bmd->blm", x, y)
            m_dash = m_dash + (1.0 - mask[:, None, :]) * -10000.0
            m = jax.nn.softmax(m_dash, -1)
            return jnp.einsum("blm,bmd->bld", m, y) * x

        a, v, t = dense["a"], dense["v"], dense["t"]
        merged = jnp.concatenate(
            [
                attention_op(a, v), attention_op(v, a), attention_op(t, a),
                attention_op(t, v), attention_op(a, t), attention_op(v, t),
                a, v, t,
            ],
            -1,
        )
        logits2 = nn.Dense(self.n_classes, name="cls2")(merged)
        logits7 = nn.Dense(7, name="cls7")(merged)
        return logits2, logits7


def sigmoid_bce(logits, labels):
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_sigmoid(logits)
    log1mp = jax.nn.log_sigmoid(-logits)
    return -(labels * logp + (1.0 - labels) * log1mp)


def masked_bce_with_logits(logits, targets, mask):
    """BCEWithLogits 'mean' over valid positions × classes (cim.py:209
    applies it to the flat [N_valid, 7] logits)."""
    per = sigmoid_bce(logits, targets)  # [B, L, 7]
    m = mask[..., None]
    return (per * m).sum() / jnp.maximum(m.sum() * logits.shape[-1], 1.0)


def resolve_fused_rnn(params) -> bool:
    """--fused_rnn=auto|on|off → bool.

    'auto': fuse only when BOTH stage batch sizes sit in the
    latency-bound regime — measured on v5e (BENCH_MATRIX CIM section):
    B=32 train 7 602 → 8 878 dia/s fused (+16.8%), but B=64 9 375 → 8 199
    and B=128 14 454 → 13 544 (wider per-step matmuls no longer
    latency-bound; the fused form's concat/slice overhead shows).
    """
    v = params.get("fused_rnn", "auto")
    if isinstance(v, bool):
        return v
    f = str(v).lower()
    if f == "auto":
        return max(
            int(params.train.batch_size),
            int(params.val.batch_size),
            int(params.test.batch_size),
        ) <= 32
    return f in ("on", "true", "1", "yes")


class CIMTrainer(Trainer):
    def imodels(self, params: ParamsType):
        self.model = CIMModule(
            text_dim=params.hidden_text,
            audio_dim=params.hidden_audio,
            visual_dim=params.hidden_visual,
            hidden_size=params.hidden_size,
            n_classes=params.n_classes,
            fused_rnn=resolve_fused_rnn(params),
        )
        self.tx = optim_factory.build_optim(params.optim)

    def loss_and_metrics(self, variables, batch, rng, train: bool):
        p = self.params
        logits2, logits7 = self.model.apply(
            variables, batch, deterministic=not train, rngs={"dropout": rng}
        )
        mask = batch["attention_mask"]
        Lce = masked_cross_entropy(logits2, batch["label"], mask)
        Lall = 0.0
        mets = {}
        if p.get("apply_bin", True):
            Lall = Lall + Lce
        if p.get("apply_multi", False) and "emo_label" in batch:
            Lmulti = masked_bce_with_logits(
                logits7, batch["emo_label"].astype(jnp.float32), mask
            )
            Lall = Lall + Lmulti
            mets["Lmulti"] = Lmulti
        mets.update(
            Lall=Lall, Lce=Lce, Acc=masked_accuracy(logits2, batch["label"], mask)
        )
        return Lall, (mets, {})

    def to_logits(self, variables, batch):
        logits2, logits7 = self.model.apply(variables, batch, deterministic=True)
        return logits2, logits7

    def test_step_collect(self, batch, logits):
        logits2, logits7 = logits
        super().test_step_collect(batch, logits2)
        if "emo_label" in batch and self.params.get("mosei_metric") == "multiemo":
            from erc_tpu.parallel import mesh as meshlib

            mask, emo, lg7 = meshlib.fetch_local(
                [batch["attention_mask"], batch["emo_label"], logits7]
            )
            mask = np.asarray(mask) > 0
            prob = 1.0 / (1.0 + np.exp(-np.asarray(lg7, np.float64)))
            self._true_multi.extend(np.asarray(emo)[mask].tolist())
            self._pred_multi.extend(prob[mask].tolist())

    def on_test_begin(self):
        self._true_multi, self._pred_multi = [], []

    def on_eval_begin(self):  # val stage shares the multilabel collectors
        self.on_test_begin()

    def on_test_end(self, res):
        import jax as _jax

        if _jax.process_count() > 1:  # identical metrics on every process
            from erc_tpu.parallel import mesh as meshlib

            self._true_multi = meshlib.allgather_rows(
                np.asarray(self._true_multi, np.float64).reshape(-1, 7)
            ).tolist()
            self._pred_multi = meshlib.allgather_rows(
                np.asarray(self._pred_multi, np.float64).reshape(-1, 7)
            ).tolist()
        if len(getattr(self, "_true_multi", [])):
            summary = metrics_mod.mosei_multilabel_summary(
                np.array(self._true_multi), np.array(self._pred_multi)
            )
            self.logger.info(
                "mosei multilabel:",
                {k: round(v, 4) for k, v in summary.items() if isinstance(v, float)},
            )
            self.metric_board.append(summary, step=self.eidx, stage="test")


main = partial(_main, CIMTrainer, CIMParams)
