"""Device-mesh topology + sharding helpers — the framework's entire
"communication backend".

The reference wires NCCL through HF Accelerate/DDP (reference:
lumo/trainer/trainer.py:62-68, data/accelerator.py:33-188,
lumo/proc/dist.py:6-28).  On TPU none of that exists as a component: we
declare a ``Mesh`` with named axes and annotate shardings; XLA emits the
collectives over ICI/DCN.  This module is the thin layer that picks the
mesh shape, shards host batches, and gates process-0-only work.

Axes:
    data   — batch sharding (DDP equivalent; psum of grads emitted by XLA)
    model  — reserved for tensor parallelism (ERC models are small, but the
             mesh carries the axis so larger backbones — e.g. the RoBERTa
             preprocessor — can shard without code changes)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = -1  # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple:
        model = max(self.model, 1)
        data = self.data if self.data > 0 else max(n_devices // model, 1)
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != {n_devices} devices; pass explicit MeshSpec"
            )
        return data, model


def make_mesh(spec: Optional[MeshSpec] = None, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec()
    data, model = spec.resolve(len(devices))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, ...] arrays: batch split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, scan_dim: bool = False):
    """Place a host batch dict onto the mesh, batch-dim over `data`.

    scan_dim=True for stacked [K, B, ...] multi-step groups (the leading
    scan axis replicates, axis 1 shards).  Works single- and multi-host:
    with multiple processes each host passes its local shard and
    `jax.make_array_from_process_local_data` assembles the global array.
    """
    sh = NamedSharding(mesh, P(None, "data")) if scan_dim else batch_sharding(mesh)

    def _place(x):
        if x is None:
            return None
        if not isinstance(x, jax.Array):  # already-placed arrays pass through
            x = np.asarray(x)
            if jax.process_count() > 1:
                return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(_place, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state under pure data parallelism)."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_params(params, mesh: Mesh, min_size: int = 1 << 16):
    """Tensor-parallel placement: large 2-D kernels split over 'model'.

    ERC models are small enough to replicate (SURVEY §2.5: TP not needed
    for parity), but the mesh carries the axis so bigger backbones (the
    RoBERTa/TSN preprocessors) shard without code changes.  Kernels whose
    last dim divides the model axis and whose size ≥ min_size go to
    P(None, 'model'); everything else replicates.  XLA inserts the
    all-gathers/reduce-scatters.
    """
    model_n = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def place(x):
        if (
            model_n > 1
            and hasattr(x, "ndim")
            and x.ndim == 2
            and x.size >= min_size
            and x.shape[-1] % model_n == 0
        ):
            return jax.device_put(x, NamedSharding(mesh, P(None, "model")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, params)


def is_main_process() -> bool:
    return jax.process_index() == 0


def fetch_local(tree):
    """``device_get`` that also works on multi-process global arrays.

    Batch-sharded global arrays are only partially addressable per process;
    plain ``device_get`` raises.  This returns each process's *local rows*
    (ordered by shard offset) — callers then combine across processes with
    :func:`allgather_rows` / :func:`allsum`.  Single-process (and host
    numpy) leaves pass through as full arrays.
    """

    def one(x):
        if x is None:
            return None
        if isinstance(x, jax.Array) and jax.process_count() > 1 and not x.is_fully_addressable:
            # dedupe replicas by the FULL index tuple and write each shard
            # at its own coordinates — dim-0-only keys silently dropped
            # shards of arrays sharded on a later axis (e.g. [K, B, ...]
            # multi-eval stacks, sharded P(None, 'data'))
            seen = set()
            shards = []
            for s in x.addressable_shards:
                key = tuple((sl.start, sl.stop) for sl in s.index)
                if key in seen:
                    continue
                seen.add(key)
                shards.append(s)
            # local view: collapse each sharded axis to the union of local
            # shard extents (assumes the per-axis extents tile contiguously
            # per process, which strided-loader + NamedSharding guarantee)
            lo = [min(s.index[d].start or 0 for s in shards) for d in range(x.ndim)]
            hi = [
                max(
                    (s.index[d].stop if s.index[d].stop is not None else x.shape[d])
                    for s in shards
                )
                for d in range(x.ndim)
            ]
            out = np.empty([h - l for l, h in zip(lo, hi)], x.dtype)
            for s in shards:
                idx = tuple(
                    slice(
                        (sl.start or 0) - l,
                        (sl.stop if sl.stop is not None else x.shape[d]) - l,
                    )
                    for d, (sl, l) in enumerate(zip(s.index, lo))
                )
                out[idx] = np.asarray(s.data)
            return out
        return np.asarray(jax.device_get(x))

    out = jax.tree_util.tree_map(one, tree)
    return out


def allgather_rows(arr: "np.ndarray") -> "np.ndarray":
    """Concatenate per-process host arrays of *varying* leading length into
    the identical global array on every process (pads to the max length for
    the collective, then trims).  No-op single-process."""
    arr = np.asarray(arr)
    if jax.process_count() <= 1:
        return arr
    from jax.experimental import multihost_utils

    counts = multihost_utils.process_allgather(np.array([arr.shape[0]]))[:, 0]
    mx = int(counts.max())
    pad_width = [(0, mx - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    padded = np.pad(arr, pad_width)
    gathered = multihost_utils.process_allgather(padded)  # [P, mx, ...]
    return np.concatenate([gathered[p, : int(counts[p])] for p in range(len(counts))], axis=0)


def allsum(*values: float):
    """Sum scalars across processes (identity single-process)."""
    if jax.process_count() <= 1:
        return values if len(values) > 1 else values[0]
    from jax.experimental import multihost_utils

    tot = multihost_utils.process_allgather(np.asarray(values, np.float64)).sum(0)
    out = tuple(float(v) for v in tot)
    return out if len(out) > 1 else out[0]


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` — MUST run before anything touches the
    jax backend (a prior ``jax.devices()``/``process_count()`` call makes
    the initialize ineffective).  Replaces env-var rank sniffing + ppid
    flag-file handshakes (reference: proc/dist.py:6-28,
    exp/experiment.py:72-88).

    Configuration sources, in priority order: explicit args, then the
    ``ERC_TPU_COORDINATOR`` / ``ERC_TPU_NUM_PROCESSES`` /
    ``ERC_TPU_PROCESS_ID`` environment (set by the launcher), else a no-op
    (single-process, or TPU-pod auto-detection via a bare
    ``jax.distributed.initialize()`` when ``ERC_TPU_DIST=auto``).
    """
    import os

    if jax._src.distributed.global_state.client is not None:
        return  # already initialized
    coordinator = coordinator or os.environ.get("ERC_TPU_COORDINATOR")
    if coordinator is None:
        if os.environ.get("ERC_TPU_DIST") == "auto":
            jax.distributed.initialize()  # TPU pod: args auto-detected
        return
    if num_processes is None and "ERC_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["ERC_TPU_NUM_PROCESSES"])
    if process_id is None and "ERC_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["ERC_TPU_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


