"""Measure host→device batch-placement time: the mechanism behind
``--transfer_dtype=bfloat16``.

The end-to-end CLI loop ships every batch over the host link (axon
tunnel here, PCIe on a directly-attached host).  This script times
``jax.device_put`` of a parity-config COGMEN batch (B=32, L=96,
text 100 + audio 100 + visual 512 dims + masks/labels) as float32 and
as bfloat16, plus the host-side quantization cost the bf16 path pays
(``transfer_cast_fn``), so BENCH_MATRIX can state the placement saving
with measured numbers instead of arithmetic.

Measurement protocol (each point matters through a tunnel):
- fresh float content every iteration — rules out any transport-level
  dedup of repeated buffers;
- per-iteration forced completion: ``block_until_ready`` on an axon
  device can return before the remote write lands, so each timed put
  ends with a 1-scalar fetch per array (adds one RTT, identical for
  both dtypes);
- f32/bf16 iterations interleaved to cancel link drift; medians
  reported.

Usage: python scripts/bench_transfer.py [--batch=32] [--len=96] [--iters=12]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def batch_bytes(batch):
    return sum(v.nbytes for v in batch.values() if isinstance(v, np.ndarray))


def timed_put(batch):
    import jax

    t0 = time.perf_counter()
    out = jax.device_put(batch)
    jax.block_until_ready(out)
    for v in out.values():
        if hasattr(v, "dtype"):
            np.asarray(v.ravel()[0])
    return time.perf_counter() - t0


def main(argv):
    B, L, iters = 32, 96, 12
    for a in argv:
        if a.startswith("--batch="):
            B = int(a.split("=", 1)[1])
        elif a.startswith("--len="):
            L = int(a.split("=", 1)[1])
        elif a.startswith("--iters="):
            iters = int(a.split("=", 1)[1])

    from erc_tpu.data.loader import transfer_cast_fn
    from erc_tpu.data.synthetic import synthetic_erc
    from erc_tpu.data.collate import ERCBatcher

    samples = synthetic_erc(
        "iemocap-cogmen", n_classes=6, n_train=B, min_len=L, max_len=L
    )
    batcher = ERCBatcher(max_len=L)
    batch = batcher(samples[:B])
    f32 = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    float_keys = [k for k, v in f32.items() if v.dtype == np.float32]

    cast = transfer_cast_fn("bfloat16")
    rng = np.random.default_rng(0)

    def fresh():
        out = dict(f32)
        for k in float_keys:
            out[k] = rng.standard_normal(f32[k].shape).astype(np.float32)
        return out

    # host-side quantization cost the bf16 path pays per batch — cast a
    # PRE-generated batch: generating fresh random floats costs ~40× the
    # cast itself and must not be attributed to it
    pre = [fresh() for _ in range(iters)]
    t_cast0 = time.perf_counter()
    for b in pre:
        cast(b)
    host_cast_ms = (time.perf_counter() - t_cast0) / iters * 1e3

    timed_put(fresh())  # warm the allocator / tunnel
    t32s, t16s = [], []
    for _ in range(iters):
        b = fresh()
        t32s.append(timed_put(b))
        t16s.append(timed_put(cast(b)))
    t32 = statistics.median(t32s)
    t16 = statistics.median(t16s)
    bf16 = cast(f32)

    print(json.dumps({
        "metric": "batch_placement_ms",
        "batch": B, "len": L,
        "f32_bytes": batch_bytes(f32),
        "bf16_bytes": batch_bytes(bf16),
        "f32_put_ms": round(t32 * 1e3, 1),
        "bf16_put_ms": round(t16 * 1e3, 1),
        "host_cast_ms": round(host_cast_ms, 2),
        "put_speedup": round(t32 / t16, 2),
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
