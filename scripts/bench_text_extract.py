"""Benchmark the TPU text-extraction path against the reference's only
recorded preprocessing number.

The reference logs its sBERT extraction wall-clock in a comment
(preprocess_text.py:3-4): ``34s [546220 3412 3412 3412]`` — 3 412
utterances (546 220 chars, ~160 chars ≈ ~40 tokens each) embedded in 34 s
≈ **100 utt/s** on its (unspecified, GPU-era) host; a second note
(``0.58s [9359 56 56 56]``) gives the same ~97 utt/s rate.

This script reproduces that workload shape on the TPU path
(erc_tpu/preprocess/lexical.py): a distilroberta-base-sized
FlaxRobertaModel (the sBERT backbone: 6 layers, hidden 768, 12 heads,
intermediate 3072, vocab 50 265) under one jit at a static
[batch, max_tokens] bucket.  Weights are random — this container has no
network egress and throughput is weight-independent — and tokenization is
simulated with realistic-length random ids (~40 valid tokens/utt); host
BPE for 3.4 k short strings is milliseconds and is not what the 34 s
measured.  Timing forces the device with a final-value fetch, same
methodology as bench.py.

Usage:  python scripts/bench_text_extract.py [--n=3412] [--batch=64]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_UTT = 3412
REFERENCE_WALL_S = 34.0  # preprocess_text.py:3


class SyntheticTok:
    """Stand-in tokenizer emitting realistic-length random ids (~40 valid
    tokens, like the reference workload's ~160-char utterances)."""

    def __init__(self, vocab_size: int, seed: int = 0):
        self.vocab_size = vocab_size
        self.rng = np.random.default_rng(seed)

    def __call__(self, sentences, **kw):
        n = len(sentences)
        L = int(kw.get("max_length", 64))
        ids = self.rng.integers(4, self.vocab_size, (n, L))
        lens = np.clip(self.rng.normal(40, 10, n).astype(int), 5, L)
        am = (np.arange(L)[None, :] < lens[:, None]).astype(np.int32)
        return {"input_ids": ids * am, "attention_mask": am}


def main(argv):
    n = 3412
    batch = 64
    max_tokens = 64
    for a in argv:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        elif a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        elif a.startswith("--max_tokens="):
            max_tokens = int(a.split("=", 1)[1])

    from transformers import FlaxRobertaModel, RobertaConfig

    from erc_tpu.preprocess.lexical import TextEncoder

    cfg = RobertaConfig(
        vocab_size=50265, hidden_size=768, num_hidden_layers=6,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=514,
    )
    model = FlaxRobertaModel(cfg, seed=0)
    enc = TextEncoder(model, SyntheticTok(cfg.vocab_size), mode="sbert",
                      max_tokens=max_tokens, batch_size=batch)

    sentences = [f"utterance {i}" for i in range(n)]
    # warmup: compile the static-bucket jit + one steady-state pass
    enc.encode(sentences[: 2 * batch])

    t0 = time.perf_counter()
    out = enc.encode(sentences)
    # encode() already fetched every batch to host (np.asarray) — the
    # clock includes device compute, transfers, and the host loop.
    assert out.shape == (n, cfg.hidden_size) and np.isfinite(out).all()
    wall = time.perf_counter() - t0

    utt_s = n / wall
    ref_rate = REFERENCE_UTT / REFERENCE_WALL_S
    import json

    print(json.dumps({
        "metric": "sbert_extract_throughput",
        "value": round(utt_s, 1),
        "unit": "utterances/s",
        "n_utterances": n,
        "wall_s": round(wall, 3),
        "batch": batch,
        "max_tokens": max_tokens,
        "reference_rate": round(ref_rate, 1),
        "vs_reference": round(utt_s / ref_rate, 1),
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
