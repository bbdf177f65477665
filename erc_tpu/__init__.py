"""erc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for multimodal
Emotion Recognition in Conversation.

Re-designed from scratch with the capability surface of
sailist/emotion-recognition-in-conversation ("MMEmo"):

- model zoo: COGMEN, MMGCN, DAG-ERC, DialogueGCN (dgcn/dgcnv2), CIM, MMIN
- a lumo-equivalent experiment runtime (params, meters, experiments,
  checkpoints, callbacks) rebuilt around a single-jit functional train step
- a static-shape data layer over the IEMOCAP/MELD/MOSEI feature dumps
- mesh-first parallelism: every array goes through ``NamedSharding`` over a
  ``jax.sharding.Mesh`` so data/model axes scale over ICI without code changes

The compute path is pure JAX (XLA + Pallas kernels); dynamic, per-dialogue
python graph construction from the reference is replaced with vectorized
masked-dense formulations over padded ``[B, L]`` dialogue tensors.
"""

__version__ = "0.1.0"

from erc_tpu.core.params import Params, BaseParams
from erc_tpu.core.meter import Meter, Record
