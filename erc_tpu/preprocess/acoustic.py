"""Acoustic feature extraction on TPU: STFT / log-mel filterbank / MFCC.

TPU re-design of the reference's from-scratch numpy pipeline
(preprocess/acoustic/melfeature.py:93-199): identical math — Hamming/Povey
windows, 0.97 pre-emphasis after DC removal, Kaldi-style mel filterbank
(hz2mel = 1127·ln(1+f/700), triangular filters dropping the DC bin),
log(|STFT|² + 1e-6)·melfilter, MFCC DCT with Q=22 liftering and the
log-energy replacing c0 — but batched, jittable, and framed via strided
reshape instead of python loops, so a whole corpus extracts as one
``jit``-ed call per bucket.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def win_hamming(n: int) -> np.ndarray:
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(n, dtype=np.float32) / (n - 1))).astype(np.float32)


def win_povey(n: int) -> np.ndarray:
    return ((0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n, dtype=np.float32) / (n - 1))) ** 0.85).astype(np.float32)


def hz2mel(hz):
    return 1127.0 * np.log(1 + np.asarray(hz, np.float64) / 700.0)


def mel_filterbank(
    fb_dim=80, fft_size=512, sample_rate=16000, low_freq=0.0, high_freq=8000.0
) -> np.ndarray:
    """Triangular mel filters, DC bin dropped (melfeature.py:57-73)."""
    high_freq = high_freq or sample_rate / 2
    low_mel, high_mel = hz2mel(low_freq), hz2mel(high_freq)
    filtfreq = np.linspace(low_mel, high_mel, fb_dim + 2)
    bins = hz2mel(sample_rate * np.arange(fft_size // 2 + 1) / fft_size)
    fbank = np.zeros((fft_size // 2 + 1, fb_dim), np.float32)
    for j in range(fb_dim):
        left, mid, right = filtfreq[j], filtfreq[j + 1], filtfreq[j + 2]
        up = (bins - left) / (mid - left)
        down = (right - bins) / (right - mid)
        fbank[:, j] = np.where(
            (bins >= left) & (bins <= mid), up,
            np.where((bins > mid) & (bins <= right), down, 0.0),
        )
    return fbank[1:, :]


def mfcc_dct(mfcc_dim=23, fb_dim=40) -> np.ndarray:
    """DCT matrix with Q=22 cepstral liftering folded in (melfeature.py:76-90)."""
    Q = 22.0
    n1, n2 = np.sqrt(1.0 / fb_dim), np.sqrt(2.0 / fb_dim)
    coef = np.zeros((fb_dim, mfcc_dim), np.float32)
    for i in range(mfcc_dim):
        cc = 1.0 + 0.5 * Q * np.sin(np.pi * i / Q)
        for j in range(fb_dim):
            coef[j, i] = (n1 if i == 0 else n2 * np.cos(np.pi * (j + 0.5) * i / fb_dim)) * cc
    return coef


def frame_signal(sig, frm_size: int, frm_sft: int):
    """[B, T] → [B, F, frm_size] frames (rolling_window, melfeature.py:25-46)."""
    B, T = sig.shape
    n_frames = (T - frm_size) // frm_sft + 1
    idx = np.arange(n_frames)[:, None] * frm_sft + np.arange(frm_size)[None, :]
    return sig[:, idx]


def _preprocess_frames(frames, window, with_energy: bool):
    frames = frames - frames.mean(-1, keepdims=True)
    energy = None
    if with_energy:
        energy = jnp.log(jnp.sum(frames * frames, -1, keepdims=True) + 1e-6)
    coeff = 0.97
    frames = jnp.concatenate(
        [frames[..., :1] * (1 - coeff), frames[..., 1:] - coeff * frames[..., :-1]], -1
    )
    return frames * window, energy


@partial(jax.jit, static_argnames=("frm_size", "frm_sft", "fft_size"))
def wav_to_stft(sig, frm_size=400, frm_sft=160, fft_size=400):
    frames = frame_signal(sig, frm_size, frm_sft)
    frames, _ = _preprocess_frames(frames, jnp.asarray(win_hamming(frm_size)), False)
    return jnp.fft.rfft(frames, n=fft_size)


@partial(jax.jit, static_argnames=("frm_size", "frm_sft", "fft_size", "fb_dim", "low_freq", "high_freq"))
def wav_to_fb(sig, frm_size=400, frm_sft=160, fft_size=512, fb_dim=80, low_freq=0.0, high_freq=8000.0):
    """Log-mel filterbank [B, F, fb_dim] (melfeature.py:123-155)."""
    frames = frame_signal(sig, frm_size, frm_sft)
    frames, _ = _preprocess_frames(frames, jnp.asarray(win_hamming(frm_size)), False)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, fft_size - frm_size)))
    stft = jnp.fft.rfft(frames)[..., 1 : fft_size // 2 + 1]
    psd = stft.real**2 + stft.imag**2 + 1e-6
    mf = jnp.asarray(mel_filterbank(fb_dim, fft_size, 16000, low_freq, high_freq))
    return jnp.log(psd @ mf)


@partial(jax.jit, static_argnames=("frm_size", "frm_sft", "fft_size", "fb_dim", "mfcc_dim"))
def wav_to_mfcc(sig, frm_size=400, frm_sft=160, fft_size=512, fb_dim=40, mfcc_dim=23):
    """MFCC with log-energy as c0 [B, F, mfcc_dim] (melfeature.py:158-199)."""
    frames = frame_signal(sig, frm_size, frm_sft)
    frames, energy = _preprocess_frames(frames, jnp.asarray(win_povey(frm_size)), True)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, fft_size - frm_size)))
    stft = jnp.fft.rfft(frames)[..., 1 : fft_size // 2 + 1]
    psd = stft.real**2 + stft.imag**2 + 1e-6
    mf = jnp.asarray(mel_filterbank(fb_dim, fft_size, 16000, 0.0, 8000.0))
    fb = jnp.log(psd @ mf)
    mfcc = fb @ jnp.asarray(mfcc_dct(mfcc_dim, fb_dim))
    return jnp.concatenate([energy, mfcc[..., 1:]], -1)
