"""TSM (Temporal Shift Module) recognizer — TPU-native equivalent of the
reference's standalone ``preprocess/video/tsm_model.py`` (TemporalShift
:26-59, make_temporal_shift place='blockres' :112-155, ConsensusModule
:224-250, TSN :619-770).

The shift itself lives in ``preprocess/video.temporal_shift`` (a
zero-padded roll over the segment axis on channel folds — pure jnp, fuses
into the following 1×1 conv under jit); ``ResNet50(n_segment=T)`` is the
shift-enabled backbone.  This module adds the TSN head: per-frame features
→ dropout → ``new_fc`` → average segment consensus.

Reference semantics preserved:
- blockres placement: the shift feeds only the residual branch's conv1;
  the identity path is unshifted (tsm_model.py:146).
- n_round=1 on ResNet-50 (layer3 has 6 < 23 blocks, :137-139) → every
  block shifts; n_segment is constant per stage (temporal_pool=False
  default, :113-116).
- dropout>0 routes the classifier through a fresh ``new_fc`` Linear
  (TSN._prepare_tsn, :688-696); before_softmax=False applies softmax
  before the consensus mean (:750; only valid with 'avg').

``port_torch_tsm`` ports a torch TSN/TSM checkpoint: the TemporalShift
wrapper renames ``layerX.Y.conv1.weight`` to ``layerX.Y.conv1.net.weight``
in the torch state_dict, which is stripped back here; the backbone then
reuses ``port_torch_resnet``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from flax import linen as nn

from erc_tpu.preprocess.video import ResNet50, port_torch_resnet, temporal_shift

__all__ = ["TSMRecognizer", "port_torch_tsm", "temporal_shift"]


class TSMRecognizer(nn.Module):
    """TSN head over the shift-enabled ResNet-50 (tsm_model.py:619-770)."""

    num_class: int
    n_segment: int = 8
    n_div: int = 8
    dropout: float = 0.8
    consensus: str = "avg"  # 'avg' | 'identity'
    before_softmax: bool = True
    is_shift: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [N, T, H, W, C] float frames (already normalized)
        n, t = x.shape[:2]
        assert t == self.n_segment, (t, self.n_segment)
        feats = ResNet50(
            n_segment=self.n_segment if self.is_shift else 0,
            n_div=self.n_div, name="base_model",
        )(x.reshape((n * t,) + x.shape[2:]), train=train)  # [N·T, 2048]
        if self.dropout > 0 and train:
            feats = nn.Dropout(self.dropout)(feats, deterministic=False)
        logits = nn.Dense(self.num_class, name="new_fc")(feats)
        if not self.before_softmax:
            if self.consensus != "avg":  # tsm_model.py:646-647
                raise ValueError("Only avg consensus can be used after Softmax")
            logits = jax.nn.softmax(logits, axis=-1)
        logits = logits.reshape(n, t, self.num_class)
        if self.consensus == "avg":
            return logits.mean(axis=1)
        return logits  # 'identity'


def port_torch_tsm(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torch TSN/TSM state_dict → flax {params, batch_stats} for
    TSMRecognizer.  Accepts both bare and ``module.``-prefixed keys and
    the TemporalShift ``conv1.net.*`` nesting."""

    def norm_key(k: str) -> str:
        if k.startswith("module."):
            k = k[len("module."):]
        return k.replace(".conv1.net.", ".conv1.")

    sd = {norm_key(k): v for k, v in state_dict.items()}
    backbone = {
        k[len("base_model."):]: v for k, v in sd.items()
        if k.startswith("base_model.") and not k.startswith("base_model.fc")
    }
    variables = port_torch_resnet(backbone)

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params = dict(variables["params"])
    out = {"params": {"base_model": params}, "batch_stats": {"base_model": variables["batch_stats"]}}
    # dropout>0 checkpoints carry the classifier as new_fc; dropout=0 ones
    # keep it at base_model.fc (TSN._prepare_tsn, tsm_model.py:688-696) —
    # port either so no trained classifier is silently dropped
    if "new_fc.weight" in sd:
        fc_w, fc_b = sd["new_fc.weight"], sd["new_fc.bias"]
    elif "base_model.fc.weight" in sd:
        fc_w, fc_b = sd["base_model.fc.weight"], sd["base_model.fc.bias"]
    else:
        raise KeyError(
            "TSM checkpoint has neither new_fc nor base_model.fc — "
            f"classifier missing (keys: {sorted(sd)[:5]}…)"
        )
    out["params"]["new_fc"] = {"kernel": arr(fc_w).T, "bias": arr(fc_b)}
    return out
