"""Config-driven optimizer factory (reference: lumo/trainer/factory.py:24-106).

The reference stores an ``OptimBuilder`` inside params (serializable) and
builds ``torch.optim.<name>`` lazily.  Here ``create_optim`` fills a params
subtree and ``build_optim`` turns it into an optax transform whose
hyperparameters are injected (``optax.inject_hyperparams``), so LR can be
changed at runtime — that is how ReduceLROnPlateau (dagerc.py:212) works
without rebuilding the jit.

Weight-decay semantics match torch:
  Adam  (weight_decay) — L2 added to the gradient before moments
  AdamW (weight_decay) — decoupled decay
"""

from __future__ import annotations

from typing import Optional

import optax

from erc_tpu.core.params import Params


def create_optim(name: str, lr: float = 1e-3, weight_decay: float = 0.0, **kw) -> Params:
    p = Params()
    p.name = name
    p.lr = lr
    p.weight_decay = weight_decay
    for k, v in kw.items():
        p[k] = v
    return p


def create_schedule(name: str, **kw) -> Params:
    """Config-object scheduler (reference: InterpFactory factory.py:10-21)."""
    p = Params()
    p.name = name
    for k, v in kw.items():
        p[k] = v
    return p


def build_schedule(cfg: Optional[Params]):
    """sche config → optax schedule fn multiplying the base LR."""
    if cfg is None or not cfg.get("name"):
        return None
    from erc_tpu.core import interp

    name = cfg.get("name")
    cls = getattr(interp, name)
    kw = {k: v for k, v in cfg.items() if k != "name"}
    return interp.to_optax_schedule(cls(**kw))


def build_optim(cfg: Params, grad_clip_norm: Optional[float] = None):
    name = cfg.get("name", "Adam").lower()
    lr = float(cfg.get("lr", 1e-3))
    wd = float(cfg.get("weight_decay", 0.0))
    b1 = float(cfg.get("beta1", 0.9))
    b2 = float(cfg.get("beta2", 0.999))
    eps = float(cfg.get("eps", 1e-8))
    # --optim.split_wd=1: exclude BN params from weight decay, matching the
    # reference's `'bn' in name` split exactly (contrib/make_optim.py:4-17);
    # --optim.split_wd=full additionally excludes biases/norm scales/1-D
    # leaves (the conventional-but-broader policy, opt-in)
    split = cfg.get("split_wd")
    mask = None
    if split:
        mask = wd_mask if str(split).lower() == "full" else wd_mask_bn

    def base(learning_rate):
        if name == "adam":
            chain = []
            if wd:
                chain.append(optax.add_decayed_weights(wd, mask=mask))  # torch Adam: L2 into grad
            chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
            chain.append(optax.scale(-learning_rate))
            return optax.chain(*chain)
        if name == "adamw":
            return optax.adamw(
                learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=wd, mask=mask
            )
        if name == "sgd":
            return optax.sgd(
                learning_rate, momentum=cfg.get("momentum", 0.0) or None,
                nesterov=bool(cfg.get("nesterov", False)),
            )
        if name == "lars":
            return optax.lars(learning_rate, weight_decay=wd)
        raise ValueError(f"unknown optimizer {name!r}")

    # declared LR schedule nested under the optim config
    # (--optim.sche.name=Cos --optim.sche.left=0 --optim.sche.right=N ...):
    # the interp curve becomes the injected learning_rate, stepped inside
    # the jit.  A declared schedule owns the LR — the host-side plateau
    # controller defers to it (trainer._plateau_step).
    sche_fn = build_schedule(cfg.get("sche"))
    tx = optax.inject_hyperparams(base)(
        learning_rate=sche_fn if sche_fn is not None else lr
    )
    if grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(float(grad_clip_norm)), tx)
    return tx


def wd_mask_bn(params):
    """Reference-exact split_wd mask: decay everything except params whose
    name contains ``bn`` (contrib/make_optim.py:4-17 checks ``'bn' in name``
    only — biases and other 1-D params still receive weight decay)."""
    import jax

    def keep(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "name", ""))) for k in path]
        return not any("bn" in n.lower() for n in names)

    return jax.tree_util.tree_map_with_path(keep, params)


def wd_mask(params):
    """Broader weight-decay mask (``--optim.split_wd=full``): excludes
    biases, norm scales, and every <2-D leaf — the conventional policy, a
    deliberate deviation from the reference's 'bn'-only split (see
    wd_mask_bn for the reference-exact behavior)."""
    import jax

    def keep(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        last = str(names[-1]) if names else ""
        if last in ("bias", "scale") or last.startswith("b_"):
            return False
        if any("bn" in str(n).lower() or "norm" in str(n).lower() for n in names[:-1]):
            return False
        return getattr(leaf, "ndim", 0) >= 2

    return jax.tree_util.tree_map_with_path(keep, params)


def set_learning_rate(opt_state, lr: float):
    """Mutate injected LR in an inject_hyperparams state (host-side)."""
    import jax

    def walk(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            hp = dict(s.hyperparams)
            hp["learning_rate"] = jax.numpy.asarray(lr, dtype=hp["learning_rate"].dtype)
            return s._replace(hyperparams=hp)
        if isinstance(s, tuple) and hasattr(s, "_fields"):
            return s
        if isinstance(s, tuple):
            return tuple(walk(x) for x in s)
        return s

    return walk(opt_state)


def get_learning_rate(opt_state) -> Optional[float]:
    def walk(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            return float(s.hyperparams["learning_rate"])
        if isinstance(s, tuple) and not hasattr(s, "_fields"):
            for x in s:
                r = walk(x)
                if r is not None:
                    return r
        return None

    return walk(opt_state)


class ReduceLROnPlateau:
    """Host-side LR controller with torch's EXACT semantics — the reference
    constructs ``lr_scheduler.ReduceLROnPlateau(optim, 'min')`` with torch
    defaults (dagerc.py:212, mmin_base.py:96): relative improvement
    threshold 1e-4, cooldown, and an eps guard on tiny LR changes.
    Differentially tested against torch in
    tests/test_fullrun_torch_equivalence.py."""

    def __init__(self, mode="min", factor=0.1, patience=10, min_lr=0.0,
                 threshold=1e-4, threshold_mode="rel", cooldown=0, eps=1e-8):
        self.mode, self.factor, self.patience, self.min_lr = mode, factor, patience, min_lr
        self.threshold, self.threshold_mode = threshold, threshold_mode
        self.cooldown, self.eps = cooldown, eps
        self.best = None
        self.bad = 0
        self.cooldown_counter = 0

    def _is_better(self, a: float) -> bool:
        if self.best is None:
            return True
        if self.threshold_mode == "rel":
            if self.mode == "min":
                return a < self.best * (1.0 - self.threshold)
            return a > self.best * (1.0 + self.threshold)
        if self.mode == "min":
            return a < self.best - self.threshold
        return a > self.best + self.threshold

    def step(self, metric: float, lr: float) -> float:
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.bad = 0
        if self.bad > self.patience:
            self.cooldown_counter = self.cooldown
            self.bad = 0
            new_lr = max(lr * self.factor, self.min_lr)
            if lr - new_lr > self.eps:
                return new_lr
        return lr
