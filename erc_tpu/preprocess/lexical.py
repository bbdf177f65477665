"""Text feature extraction on TPU (reference: preprocess/lexical/extractor.py:52-93).

sBERT (`paraphrase-distilroberta-base-v1`, mean-pooled) or RoBERTa-large
(pooler output) utterance embeddings → ``{sbert|robert}_map.pkl`` keyed by
dialogue id — re-built as batched Flax inference under one jit per padding
bucket instead of per-dialogue torch calls.

Model weights load from a local path (``--model_path``); this container
has no network egress, so tests exercise the pipeline with a small
random-weight config.
"""

from __future__ import annotations

import pickle
from functools import partial
from typing import Dict, List, Optional

import numpy as np


def mean_pool(hidden, attention_mask):
    """Sentence-transformers mean pooling over valid tokens."""
    m = attention_mask[..., None].astype(hidden.dtype)
    return (hidden * m).sum(1) / np.maximum(np.asarray(m.sum(1)), 1e-9)


class TextEncoder:
    def __init__(self, model=None, tokenizer=None, mode: str = "sbert",
                 max_tokens: int = 64, batch_size: int = 64):
        self.model = model
        self.tokenizer = tokenizer
        self.mode = mode
        self.max_tokens = max_tokens
        self.batch_size = batch_size
        self._jitted = None

    @classmethod
    def from_pretrained(cls, path: str, mode: str = "sbert", **kw) -> "TextEncoder":
        from transformers import AutoTokenizer, FlaxAutoModel

        tok = AutoTokenizer.from_pretrained(path)
        model = FlaxAutoModel.from_pretrained(path)
        return cls(model, tok, mode, **kw)

    def _encode_fn(self):
        if self._jitted is None:
            import jax

            # params enter as a jit ARGUMENT, not a closure capture — a
            # closed-over FlaxPreTrainedModel bakes its full weight tree
            # into the HLO as constants (bloats every compile; overflows
            # remote-compile request limits for real-sized encoders)
            def fn(params, input_ids, attention_mask):
                out = self.model(
                    input_ids=input_ids, attention_mask=attention_mask, params=params
                )
                if self.mode == "robert" and getattr(out, "pooler_output", None) is not None:
                    return out.pooler_output
                import jax.numpy as jnp

                m = attention_mask[..., None].astype(out.last_hidden_state.dtype)
                return (out.last_hidden_state * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)

            jitted = jax.jit(fn)
            self._jitted = lambda ids, am: jitted(self.model.params, ids, am)
        return self._jitted

    def encode(self, sentences: List[str]) -> np.ndarray:
        enc = self.tokenizer(
            sentences, padding="max_length", truncation=True,
            max_length=self.max_tokens, return_tensors="np",
        )
        fn = self._encode_fn()
        outs = []
        bs = self.batch_size
        n = len(sentences)
        for i in range(0, n, bs):
            ids = enc["input_ids"][i : i + bs]
            am = enc["attention_mask"][i : i + bs]
            pad = bs - len(ids)  # static batch shape → one compile
            if pad:
                ids = np.pad(ids, ((0, pad), (0, 0)))
                am = np.pad(am, ((0, pad), (0, 0)))
            out = np.asarray(fn(ids, am))
            outs.append(out[: min(bs, n - i)])
        return np.concatenate(outs, 0)

    def encode_dialogues(self, video_sentence: Dict[str, List[str]]) -> Dict[str, np.ndarray]:
        """Per-dialogue embedding map (extractor.py:64-77 semantics)."""
        return {k: self.encode(v) for k, v in video_sentence.items()}


def extract_text_features(
    dataset_name: str,
    mode: str = "sbert",
    model_path: Optional[str] = None,
    out_path: Optional[str] = None,
):
    """CLI flow (extractor.py:52-93): dataset → sentences → map pkl.

    Extraction-view names (iemocap-cogmen-text-4/6, meld-mmgcn-text-7,
    mosei-text-any-7 — reference datas/__init__.py:73-81) resolve straight
    to a {dialogue: sentences} map; training names fall back to collecting
    sentences from their sample lists."""
    from erc_tpu.data.registry import get_root, pick_datas

    root = get_root(dataset_name)
    if "-text-" in dataset_name:
        video_sentence = pick_datas(root, dataset_name)
    else:
        samples = pick_datas(root, dataset_name, split="train") + pick_datas(
            root, dataset_name, split="test"
        )
        video_sentence = {
            s.get("ids", i): s["sentence"] for i, s in enumerate(samples) if s.get("sentence")
        }
    default_model = (
        "sentence-transformers/paraphrase-distilroberta-base-v1"
        if mode == "sbert"
        else "roberta-large"
    )
    enc = TextEncoder.from_pretrained(model_path or default_model, mode)
    res = enc.encode_dialogues(video_sentence)
    out_path = out_path or f"{root}/{mode}_map.pkl"
    with open(out_path, "wb") as f:
        pickle.dump(res, f)
    return out_path
