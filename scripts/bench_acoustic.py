"""Benchmark acoustic feature extraction: the TPU pipeline vs the
reference's own numpy implementation, run head-to-head in this container.

The reference extracts log-mel filterbanks with a from-scratch numpy
pipeline (preprocess/acoustic/melfeature.py:119-155) driven one wav at a
time (extractor.py:26-45, joblib-parallel across cores — serial on this
1-core host, so the measured rate IS its per-core rate).  That module
imports only numpy, so this script loads it straight from
/root/reference and times it on the same synthetic corpus as the TPU
path (erc_tpu/preprocess/acoustic.py): IEMOCAP-like utterances, 2-8 s at
16 kHz, fb_dim=80 defaults.

Three rates are reported, because the op is bandwidth-heavy and the rig
matters:
- ``reference``: numpy wav_to_fb per utterance (one core);
- ``tpu_device``: the jit on a resident [batch, T] block — the per-chip
  compute rate, what a production (PCIe-attached) host approaches since
  PCIe moves a batch in ~2 ms;
- ``tpu_e2e_tunnel``: this rig's honest end-to-end (int16 upload like a
  wav file, f32 filterbanks fetched back) — bounded by the axon tunnel's
  ~30 MB/s, reported so nobody mistakes the device rate for what this
  specific test rig delivers.

Usage: python scripts/bench_acoustic.py [--n=1024] [--batch=64]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_MELFEATURE = "/root/reference/preprocess/acoustic/melfeature.py"


def load_reference_melfeature():
    spec = importlib.util.spec_from_file_location("ref_melfeature", REF_MELFEATURE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main(argv):
    n, batch = 1024, 64
    for a in argv:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        elif a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])

    rng = np.random.default_rng(0)
    sr = 16000
    # IEMOCAP-like utterance lengths: 2-8 s, mean ~5 s
    lens = rng.integers(2 * sr, 8 * sr, n)
    T = 8 * sr  # the TPU bucket pads to the longest

    # --- reference rate: per-utterance numpy, measured on a sample.
    # Signals are PRE-generated: data synthesis must not be charged to
    # either side's timed region.
    ref = load_reference_melfeature()
    n_ref = min(n, 64)
    ref_sigs = [
        rng.standard_normal((1, lens[i])).astype(np.float32)
        for i in range(n_ref)
    ]
    t0 = time.perf_counter()
    for sig in ref_sigs:
        ref.wav_to_fb(sig)
    ref_wall = time.perf_counter() - t0
    ref_rate = n_ref / ref_wall

    import jax
    import jax.numpy as jnp

    from erc_tpu.preprocess import acoustic as ac

    block = rng.standard_normal((batch, T)).astype(np.float32)
    dev = jax.device_put(block)
    out = ac.wav_to_fb(dev)
    out.block_until_ready()
    np.asarray(out[0, 0, 0])  # compile + force

    # --- device rate: resident input, forced completion
    iters = max(2, (n + batch - 1) // batch)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ac.wav_to_fb(dev)
        out.block_until_ready()
    np.asarray(out[0, 0, 0])
    dev_rate = iters * batch / (time.perf_counter() - t0)

    # --- this rig's end-to-end: int16 up (wav-file dtype), f32 fb down;
    # host blocks pre-generated for the same reason as above
    n_e2e = min(n, 4 * batch)  # a few batches suffice; link-bound
    hosts = [
        (rng.standard_normal((batch, T)) * 8192).astype(np.int16)
        for _ in range(n_e2e // batch)
    ]
    t0 = time.perf_counter()
    for host in hosts:
        d = jax.device_put(host)
        o = ac.wav_to_fb(d.astype(jnp.float32))
        np.asarray(o)
    e2e_rate = len(hosts) * batch / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "fbank_extract_throughput",
        "value": round(dev_rate, 1),
        "unit": "utterances/s (device)",
        "reference_rate": round(ref_rate, 1),
        "vs_reference": round(dev_rate / ref_rate, 1),
        "tpu_e2e_tunnel_rate": round(e2e_rate, 1),
        "n": n, "batch": batch,
        "mean_utt_s": round(float(lens.mean()) / sr, 2),
        "ref_utt_measured": n_ref,
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
