"""Test config: force a virtual 8-device CPU platform so mesh-sharded code
paths run without TPU hardware (SURVEY.md §4: multi-host simulation).

Note: the axon TPU plugin (sitecustomize) overrides the JAX_PLATFORMS env
var, so we must override through jax.config *before* backend init.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# tests create many Experiments; don't pile run snapshots onto this repo
os.environ.setdefault("ERC_TPU_GIT_SNAPSHOT", "0")
