"""Synthetic dialogue generator matching the real feature-dump geometry.

Used by tests and by the benchmark harness when the licensed
IEMOCAP/MELD/MOSEI dumps are absent.  Labels are a noisy function of the
text features, so models can genuinely *learn* on synthetic data (used by
the end-to-end learning tests).
"""

from __future__ import annotations

import numpy as np

# dataset-name-driven dims (reference: mmbase.py:62-123)
_DIMS = {
    "iemocap-cogmen": dict(text=100, audio=100, visual=512, n_speakers=2),
    "meld-mmgcn": dict(text=600, audio=300, visual=342, n_speakers=9),
    "mosei": dict(text=300, audio=74, visual=35, n_speakers=1),
}


def synthetic_erc(
    prefix: str,
    n_classes: int,
    split: str = "train",
    n_train: int = 120,
    n_test: int = 31,
    min_len: int = 16,
    max_len: int = 110,
    seed: int = 0,
    text_dim=None,
    audio_dim=None,
    visual_dim=None,
):
    import os

    # scale knob for end-to-end CLI throughput runs: the fixed 120-dialogue
    # epoch is too small to measure the steady-state loop (epoch turnaround
    # dominates); real dumps are ~thousands of dialogues.  The env applies
    # ONLY when the caller left the default — an explicit n_train (e.g.
    # Trainer.example_batch's 2-dialogue init batch) must always win
    if n_train == 120:
        n_train = int(os.environ.get("ERC_TPU_SYNTH_TRAIN", n_train))
    if n_test == 31:
        n_test = int(os.environ.get("ERC_TPU_SYNTH_TEST", n_test))
    dims = dict(_DIMS.get(prefix, _DIMS["iemocap-cogmen"]))
    if text_dim:
        dims["text"] = text_dim
    if audio_dim:
        dims["audio"] = audio_dim
    if visual_dim:
        dims["visual"] = visual_dim
    S = dims["n_speakers"]
    n = n_train if split == "train" else n_test
    # distinct stream per split: val identical to test would make
    # --select_on=val silently select on the test set
    offset = {"train": 0, "test": 1, "val": 2, "valid": 2}.get(split, 3)
    rng = np.random.default_rng(seed + offset)
    # fixed class prototypes shared by both splits so test is learnable
    proto_rng = np.random.default_rng(seed + 1234)
    protos = {
        m: proto_rng.normal(size=(n_classes, dims[m])).astype(np.float32)
        for m in ("text", "audio", "visual")
    }
    res = []
    for _ in range(n):
        L = int(rng.integers(min_len, max_len + 1))
        label = rng.integers(0, n_classes, L)
        spk = rng.integers(0, S, L)
        sample = {
            "speakers": [np.eye(S, dtype=int)[s].tolist() for s in spk],
            "label": label.astype(np.int64),
            "sentence": [f"utt_{i}" for i in range(L)],
        }
        for m, key in (("text", "text"), ("audio", "audio"), ("visual", "visual")):
            feat = protos[m][label] + 0.8 * rng.normal(size=(L, dims[m]))
            sample[key] = feat.astype(np.float32)
        res.append(sample)
    return res


def synthetic_mosei(n_classes: int, split: str = "train", seed: int = 0, **kw):
    """MOSEI-shaped samples with multitask labels (emo_label / senti2_label)."""
    base = synthetic_erc("mosei", 7, split, seed=seed, **kw)
    rng = np.random.default_rng(seed + 7)
    for s in base:
        L = len(s["label"])
        s["speakers"] = [[0]]
        emo = np.zeros((L, 7), dtype=int)
        emo[np.arange(L), s["label"]] = 1
        s["emo_label"] = emo
        # sentiment labels derive from the (feature-correlated) emotion label
        # with 10% flip noise, so sentiment heads are LEARNABLE on synthetic
        # data — learns-on-synthetic e2e tests need a signal to find
        flip = rng.random(L) < 0.1
        s["senti2_label"] = np.where(flip, rng.integers(0, 2, L),
                                     (s["label"] >= 4).astype(np.int64))
        s["senti7_label"] = np.where(flip, rng.integers(0, 7, L), s["label"])
        s["label"] = s["senti2_label"].astype(np.int64) if n_classes == 2 else s["label"]
    return base


def synthetic_daily(n_classes=7, split="train", n_train=24, vocab=400,
                    min_len=4, max_len=12, n_words=20, seed=0):
    """Token dialogues shaped like the DailyDialog reader's output
    (data/dailydialog.py) for tests/benchmarks of the dgcnv2_daily track."""
    rng = np.random.default_rng(
        seed + {"train": 0, "test": 1}.get(split, 2)
    )
    n = n_train if split == "train" else max(n_train // 3, 2)
    # label-correlated token bands: each class draws most tokens from its own
    # slice of the vocabulary (20% uniform noise), so the token track is
    # learnable — random labels would make learns-on-synthetic tests vacuous
    band = max((vocab - 2) // max(n_classes, 1), 1)
    out = []
    for _ in range(n):
        ln = int(rng.integers(min_len, max_len + 1))
        labels = rng.integers(0, n_classes, size=ln)
        tokens = []
        for y in labels:
            k = int(rng.integers(3, n_words))
            # clamp so the band always fits inside [1, vocab): with a tiny
            # vocab (vocab <= n_classes) high classes would otherwise get
            # an empty range and rng.integers(lo, hi<=lo) raises
            lo = min(1 + int(y) * band, max(vocab - band, 1))
            toks = rng.integers(lo, min(lo + band, vocab), size=k)
            noise = rng.random(k) < 0.2
            toks = np.where(noise, rng.integers(1, vocab, size=k), toks)
            tokens.append(toks.tolist())
        out.append(
            {
                "tokens": tokens,
                "speakers": rng.integers(0, 2, size=ln).tolist(),
                "label": labels.tolist(),
            }
        )
    return out
