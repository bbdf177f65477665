"""Static-shape dialogue batching.

TPU re-design of the reference's ERCCollate (mmbase.py:344-455): instead of
padding to the per-batch max length (a different shape every step — a
recompile every step under jit), lengths are rounded up to a small set of
buckets, so the whole run compiles a handful of programs.  The batch dict
keys match ERCCollate: attention_mask, text_length, text/audio/visual_feature,
input_tensor (modalities concatenated in modality-string order,
mmbase.py:406-415), speaker_tensor, label — except label stays [B, L]
padded with -1 (the mask selects valid nodes; equivalent to the reference's
flattened labels under mask-before-metric ordering, mmbase.py:186-194).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def bucket_length(L: int, bucket: int = 0, max_len: int = 128) -> int:
    """bucket <= 0 → single bucket (always pad to max_len: one compile per
    run — right when compiles are expensive); otherwise round L up to a
    multiple of `bucket` (less padding waste, a few compiles)."""
    if bucket <= 0:
        return max_len
    return min(max(((L + bucket - 1) // bucket) * bucket, bucket), max_len)


class ERCBatcher:
    def __init__(
        self,
        modality: str = "atv",
        n_classes: int = 6,
        n_speakers: int = 2,
        speaker_onehot: bool = False,
        bucket: int = 0,
        max_len: int = 128,
        pad_batch_to: Optional[int] = None,
    ):
        self.modality = modality
        self.n_classes = n_classes
        self.n_speakers = n_speakers
        self.speaker_onehot = speaker_onehot
        self.bucket = bucket
        self.max_len = max_len
        self.pad_batch_to = pad_batch_to

    def __call__(self, samples: List[dict]) -> Dict[str, np.ndarray]:
        from erc_tpu import native

        B = len(samples)
        Bp = self.pad_batch_to or B
        lengths = np.array(
            [min(len(s["text"]), self.max_len) for s in samples], dtype=np.int32
        )
        L = bucket_length(int(lengths.max()), self.bucket, self.max_len)
        lengths = np.minimum(lengths, L)
        lens_p = np.zeros(Bp, np.int32)
        lens_p[:B] = lengths

        # native multi-threaded packing (erc_tpu/native/collate.cpp); every
        # call falls back to numpy if the .so is unavailable
        mask = native.fill_mask(lens_p, L)
        label = native.pack_labels(
            [np.asarray(s["label"]) for s in samples] + [None] * (Bp - B), lens_p, L, -1
        )

        spk_rows = []
        for s in samples:
            spk_arr = np.asarray(s["speakers"])
            if spk_arr.ndim == 2 and spk_arr.shape[0] >= 1 and spk_arr.shape[0] < len(s["label"]):
                spk_rows.append(np.zeros(len(s["label"]), np.int32))  # MOSEI [[0]]
            elif spk_arr.ndim == 2:
                spk_rows.append(spk_arr.argmax(-1).astype(np.int32))
            else:
                spk_rows.append(spk_arr.astype(np.int32))
        spk = native.pack_labels(spk_rows + [None] * (Bp - B), lens_p, L, 0)

        mod_arrays = {}
        key_of = {"a": "audio", "t": "text", "v": "visual"}
        for m in self.modality:
            D = np.asarray(samples[0][key_of[m]]).shape[-1]
            rows = [np.asarray(s[key_of[m]], np.float32) for s in samples]
            mod_arrays[m] = native.pack_rows(rows + [None] * (Bp - B), lens_p, L, D)

        has_emo = "emo_label" in samples[0]
        if has_emo:
            emo = np.zeros((Bp, L, 7), np.int32)
            senti2 = np.full((Bp, L), -1, np.int32)
            for i, s in enumerate(samples):
                ln = lengths[i]
                emo[i, :ln] = np.asarray(s["emo_label"])[:ln]
                senti2[i, :ln] = np.asarray(s["senti2_label"])[:ln]

        input_tensor = np.concatenate([mod_arrays[m] for m in self.modality], -1)

        if self.speaker_onehot:
            speaker_tensor = np.eye(self.n_speakers, dtype=np.float32)[spk] * mask[..., None]
        else:
            speaker_tensor = spk

        len_padded = np.zeros(Bp, np.int32)
        len_padded[:B] = lengths
        batch = {
            "attention_mask": mask,
            "text_length": len_padded,
            "text_feature": mod_arrays.get("t"),
            "audio_feature": mod_arrays.get("a"),
            "visual_feature": mod_arrays.get("v"),
            "input_tensor": input_tensor,
            "speaker_tensor": speaker_tensor,
            "speaker_ids": spk,
            "label": label,
        }
        if has_emo:
            batch["emo_label"] = emo
            batch["senti2_label"] = senti2
        return batch
