"""Checkpoint manager (reference: lumo/trainer/saver.py:45-286).

Three tiers with the reference's semantics:
  - ``checkpoint.<N>.ckpt``   rotating, pruned to ``max_keep``
  - ``model.<tag>.ckpt``      overwrite-style saves
  - ``key.<N>.ckpt``          permanent keypoints
each with an optional ``best.*`` copy and a ``.json`` meta sidecar.

State is a single pytree {params, opt_state, batch_stats, step, extra}
serialized with flax msgpack — params/opt-state/PRNG/step in one blob, a
strict superset of the reference's state_dict capture (base.py:179-207).
RNG does not need snapshotting: keys derive from (seed, tag, step).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class Saver:
    def __init__(self, save_dir: str, max_keep: int = 3, write: bool = True):
        # write=False (non-main processes): all save_* calls become no-ops
        # that still return the canonical path — on a shared filesystem the
        # main process writes that exact file, and concurrent writers from
        # sibling processes would corrupt it
        self.save_dir = save_dir
        self.max_keep = max_keep
        self.write = write
        os.makedirs(save_dir, exist_ok=True)

    # -- low level ------------------------------------------------------------
    def _write(self, path: str, tree: Any, meta: Optional[Dict] = None):
        if not self.write:
            return path
        # atomic: a preemption mid-write must never leave a truncated
        # .ckpt where the latest checkpoint should be — AutoResume picks
        # the newest file by name, so write to a tmp and rename (atomic on
        # one filesystem).  Meta lands first: a .ckpt without meta resumes
        # with defaults, but meta without .ckpt is never read.
        if meta is not None:
            tmp_meta = path + ".json.tmp"
            with open(tmp_meta, "w") as f:
                json.dump(meta, f, indent=2, default=str)
            os.replace(tmp_meta, path + ".json")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(_to_host(tree)))
        os.replace(tmp, path)
        return path

    def load_into(self, path: str, target: Any) -> Any:
        with open(path, "rb") as f:
            return serialization.from_bytes(target, f.read())

    def load_params(self, path: str, target_params: Any) -> Any:
        """Extract the model-weights subtree from a saved file into
        ``target_params``.

        Every file this Saver writes is a full TrainState tree (params /
        opt_state / model_state / step / ema_params — trainer.py
        ``_state_tree``), but warm-start consumers (mmin_miss's frozen
        encoder, mmin_miss2's netB) only want the weights — the reference
        loads ``sd['models']['model']`` the same way
        (track_mm/mmin_miss.py:145-146).  Restores without a structure
        target first, then unpacks: a full state tree yields its
        ``params`` entry; a bare params tree passes through.
        """
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        if isinstance(raw, dict) and {"params", "opt_state", "step"} <= set(raw):
            raw = raw["params"]
        return serialization.from_state_dict(target_params, raw)

    # -- tiers ----------------------------------------------------------------
    def save_checkpoint(
        self, step: int, tree: Any, meta: Optional[Dict] = None, is_best: bool = False
    ) -> str:
        path = os.path.join(self.save_dir, f"checkpoint.{step:08d}.ckpt")
        self._write(path, tree, meta)
        if is_best and self.write:
            shutil.copy(path, os.path.join(self.save_dir, "best.checkpoint.ckpt"))
        if self.write:
            self._prune()
        return path

    def save_model(self, tag: str, tree: Any, meta: Optional[Dict] = None, is_best=False) -> str:
        path = os.path.join(self.save_dir, f"model.{tag}.ckpt")
        self._write(path, tree, meta)
        if is_best and self.write:
            shutil.copy(path, os.path.join(self.save_dir, "best.model.ckpt"))
        return path

    def save_keypoint(self, step: int, tree: Any, meta: Optional[Dict] = None) -> str:
        path = os.path.join(self.save_dir, f"key.{step:08d}.ckpt")
        return self._write(path, tree, meta)

    def _prune(self):
        cps = self.list_checkpoints()
        while len(cps) > self.max_keep:
            victim = cps.pop(0)
            for p in (victim, victim + ".json"):
                if os.path.exists(p):
                    os.remove(p)

    # -- listings / resume ----------------------------------------------------
    def list_checkpoints(self) -> List[str]:
        return sorted(
            os.path.join(self.save_dir, f)
            for f in os.listdir(self.save_dir)
            if f.startswith("checkpoint.") and f.endswith(".ckpt")
        )

    def latest_checkpoint(self) -> Optional[str]:
        cps = self.list_checkpoints()
        return cps[-1] if cps else None

    def best_checkpoint(self) -> Optional[str]:
        p = os.path.join(self.save_dir, "best.checkpoint.ckpt")
        return p if os.path.exists(p) else None
