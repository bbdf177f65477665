"""Acoustic feature re-extraction entry (reference: preprocess.py →
preprocess/acoustic/extractor.py): mel-fbank / MFCC over wav files, batched
on TPU.

    python preprocess.py --wav_dir=/path/wavs --feature=fbank --out=feat.pkl
"""

import os
import pickle
import wave

import numpy as np

from erc_tpu.core.params import BaseParams


def read_wav(path):
    with wave.open(path, "rb") as w:
        n = w.getnframes()
        data = np.frombuffer(w.readframes(n), dtype=np.int16).astype(np.float32)
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(-1)
    return data / 32768.0


def main():
    p = BaseParams()
    p.wav_dir = None
    p.feature = p.choice("fbank", "mfcc", "stft")
    p.out = "acoustic_features.pkl"
    p.fb_dim = 80
    p.finalize()
    assert p.get("wav_dir"), "--wav_dir required"

    from erc_tpu.preprocess import acoustic

    fns = {"fbank": acoustic.wav_to_fb, "mfcc": acoustic.wav_to_mfcc, "stft": acoustic.wav_to_stft}
    fn = fns[p.feature]
    res = {}
    for name in sorted(os.listdir(p.wav_dir)):
        if not name.endswith(".wav"):
            continue
        sig = read_wav(os.path.join(p.wav_dir, name))[None, :]
        if sig.shape[1] < 400:
            continue
        res[name[:-4]] = np.asarray(fn(sig))[0]
    with open(p.out, "wb") as f:
        pickle.dump(res, f)
    print(f"wrote {len(res)} features to {p.out}")


if __name__ == "__main__":
    main()
