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


def initialize_distributed(coordinator: Optional[str] = None) -> None:
    """`jax.distributed.initialize` once per process (no-op single-process).

    Replaces env-var rank sniffing + ppid flag-file handshakes
    (reference: proc/dist.py:6-28, exp/experiment.py:72-88).
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator)


