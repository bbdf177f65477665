"""Test config: force a virtual 8-device CPU platform so mesh-sharded code
paths run without TPU hardware (SURVEY.md §4: multi-host simulation).

Note: the axon TPU plugin (sitecustomize) overrides the JAX_PLATFORMS env
var, so we must override through jax.config *before* backend init.
"""

import os

# the AOT loader logs a scary-but-benign note about the `prefer-no-scatter`
# XLA preference pseudo-features on every cache hit; silence C++ logs
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent CPU compile cache: the suite's cost is ~20 model-sized XLA
# compiles on this box's single core; warm reruns drop from ~10 min to ~3.
# (kept separate from the TPU cache dir used by parallel/cache.py)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/erc_tpu_xla_cpu_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# tests create many Experiments; don't pile run snapshots onto this repo
os.environ.setdefault("ERC_TPU_GIT_SNAPSHOT", "0")
