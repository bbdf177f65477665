"""Acoustic features: jax pipeline vs a numpy oracle of the reference math
(preprocess/acoustic/melfeature.py)."""

import numpy as np
import pytest

from erc_tpu.preprocess import acoustic


def oracle_fb(sig, frm_size=400, frm_sft=160, fft_size=512, fb_dim=80):
    """Direct numpy port of wav_to_fb (melfeature.py:123-155)."""
    cn, T = sig.shape
    n = (T - frm_size) // frm_sft + 1
    idx = np.arange(n)[:, None] * frm_sft + np.arange(frm_size)[None, :]
    frames = sig[:, idx].reshape(-1, frm_size)
    frames = frames - frames.mean(-1, keepdims=True)
    coeff = 0.97
    frames = np.concatenate(
        [frames[:, :1] * (1 - coeff), frames[:, 1:] - coeff * frames[:, :-1]], 1
    )
    frames = frames * acoustic.win_hamming(frm_size)
    frames = np.pad(frames, [[0, 0], [0, fft_size - frm_size]])
    stft = np.fft.rfft(frames)[:, 1 : fft_size // 2 + 1]
    psd = stft.real**2 + stft.imag**2 + 1e-6
    mf = acoustic.mel_filterbank(fb_dim, fft_size, 16000, 0.0, 8000.0)
    return np.log(psd @ mf).reshape(cn, n, fb_dim)


def reference_mel_filter(fb_dim=80, fft_size=512, sample_rate=16000, low_freq=0.0, high_freq=8000.0):
    """Loop port of get_mel_filter (melfeature.py:57-73)."""

    def hz2mel(hz):
        return 1127.0 * np.log(1 + hz / 700.0)

    low_mel, high_mel = hz2mel(low_freq), hz2mel(high_freq)
    filtfreq = np.linspace(low_mel, high_mel, fb_dim + 2)
    fbank = np.zeros([fft_size // 2 + 1, fb_dim])
    for i in range(fft_size // 2 + 1):
        freq = hz2mel(sample_rate * i * 1.0 / fft_size)
        for j in range(fb_dim):
            if filtfreq[j] <= freq <= filtfreq[j + 1]:
                fbank[i, j] = (freq - filtfreq[j]) / (filtfreq[j + 1] - filtfreq[j])
            if filtfreq[j + 1] < freq <= filtfreq[j + 2]:
                fbank[i, j] = (filtfreq[j + 2] - freq) / (filtfreq[j + 2] - filtfreq[j + 1])
    return fbank[1:, :].astype(np.float32)


def test_mel_filterbank_matches_reference_loop():
    got = acoustic.mel_filterbank(40, 512)
    want = reference_mel_filter(40, 512)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fb_matches_oracle():
    rng = np.random.default_rng(0)
    sig = rng.normal(size=(2, 16000)).astype(np.float32)
    got = np.asarray(acoustic.wav_to_fb(sig))
    want = oracle_fb(sig)
    assert got.shape == want.shape == (2, 98, 80)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mfcc_shape_and_energy():
    rng = np.random.default_rng(1)
    sig = rng.normal(size=(1, 8000)).astype(np.float32)
    out = np.asarray(acoustic.wav_to_mfcc(sig))
    assert out.shape == (1, (8000 - 400) // 160 + 1, 23)
    # c0 is the frame log-energy
    frames = sig[:, np.arange(out.shape[1])[:, None] * 160 + np.arange(400)[None, :]]
    frames = frames - frames.mean(-1, keepdims=True)
    want_e = np.log((frames**2).sum(-1) + 1e-6)
    np.testing.assert_allclose(out[0, :, 0], want_e[0], rtol=1e-3, atol=1e-3)


def test_stft_shape():
    sig = np.zeros((1, 4000), np.float32)
    out = np.asarray(acoustic.wav_to_stft(sig))
    assert out.shape == (1, (4000 - 400) // 160 + 1, 201)


# ---------------------------------------------------------------------------
# Differential parity vs the REFERENCE's own melfeature module — the oracle
# is /root/reference/preprocess/acoustic/melfeature.py itself (numpy-only,
# imported straight from the tree), not a hand-built replica, so a shared
# misreading of the reference math cannot pass.

_REF_MELFEATURE = "/root/reference/preprocess/acoustic/melfeature.py"


@pytest.fixture(scope="module")
def ref_melfeature():
    import importlib.util

    if not (
        __import__("os").path.exists(_REF_MELFEATURE)
    ):
        pytest.skip("reference tree not present")
    spec = importlib.util.spec_from_file_location("_ref_melfeature", _REF_MELFEATURE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fb_differential_vs_reference_module(ref_melfeature):
    rng = np.random.default_rng(7)
    sig = rng.normal(size=(2, 12000)).astype(np.float32)
    got = np.asarray(acoustic.wav_to_fb(sig))
    want = ref_melfeature.wav_to_fb(sig)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mfcc_differential_vs_reference_module(ref_melfeature):
    rng = np.random.default_rng(8)
    sig = rng.normal(size=(1, 9600)).astype(np.float32)
    # extractor.py:42 calls with mfcc_dim=24
    got = np.asarray(acoustic.wav_to_mfcc(sig, fb_dim=40, mfcc_dim=24))
    want = ref_melfeature.wav_to_mfcc(sig, fb_dim=40, mfcc_dim=24)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_stft_differential_vs_reference_module(ref_melfeature):
    rng = np.random.default_rng(9)
    sig = rng.normal(size=(1, 6400)).astype(np.float32)
    got = np.asarray(acoustic.wav_to_stft(sig))
    want = ref_melfeature.wav_to_stft(sig)
    assert got.shape == want.shape
    np.testing.assert_allclose(got.real, want.real, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got.imag, want.imag, rtol=1e-3, atol=1e-3)
