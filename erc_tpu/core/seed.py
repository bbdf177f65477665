"""Explicit-PRNG discipline (reference: lumo/trainer/rnd.py, utils/random.py).

The reference snapshots global torch/numpy RNG state under named marks; on
TPU the right design is *no global RNG at all*: a single root
``jax.random.PRNGKey(seed)`` fans out via ``fold_in`` with stable string
tags, so every consumer (init, dropout per-step, data shuffle per-epoch)
is a pure function of (seed, tag, counter) and is reproducible across
restarts and process counts by construction.
"""

from __future__ import annotations

import zlib

import jax
import numpy as np


def _tag_to_int(tag: str) -> int:
    return zlib.crc32(tag.encode()) & 0x7FFFFFFF


class RngPool:
    """Deterministic key derivation from one seed.

    ``pool.key('dropout', step)`` is a pure function — no hidden state, safe
    under jit and multi-host (every process derives identical keys).
    """

    def __init__(self, seed: int):
        self.seed = int(seed)
        self._root = jax.random.PRNGKey(self.seed)

    def key(self, tag: str, *counters: int) -> jax.Array:
        k = jax.random.fold_in(self._root, _tag_to_int(tag))
        for c in counters:
            k = jax.random.fold_in(k, int(c))
        return k

    def numpy_rng(self, tag: str, *counters: int) -> np.random.Generator:
        """Host-side generator for data shuffling (per-epoch reshuffle etc.)."""
        s = [self.seed, _tag_to_int(tag), *map(int, counters)]
        return np.random.default_rng(np.array(s, dtype=np.uint64))


def fix_seed(seed: int) -> RngPool:
    """Seed host-side numpy global RNG (for legacy code paths) and return a pool."""
    np.random.seed(seed % (2**32))
    return RngPool(seed)
