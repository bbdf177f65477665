"""Model summary — the TPU-native answer to the reference's vendored
pytorch-summary (lumo/sketch/torchsummary.py:19-122: forward hooks collect
per-layer output shapes + param counts, then a table with MB estimates).

Flax modules already carry their hierarchy in the param-tree paths, and
``jax.eval_shape`` gives init/apply shapes without allocating a byte or
touching a device — so the summary here is abstract-evaluation-based
instead of hook-based: exact per-module param counts/bytes, model output
shapes, and the same input/params/output MB footprint block, with zero
compute.
"""

from __future__ import annotations

from math import prod
from typing import Any, Dict, List, Tuple


def _leaves_with_paths(tree) -> List[Tuple[str, Any]]:
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        keys = []
        for p in path:
            keys.append(str(getattr(p, "key", getattr(p, "idx", p))))
        out.append(("/".join(keys), leaf))
    return out


def param_summary(params, depth: int = 2) -> List[Dict]:
    """Group a params tree by module path prefix (the flax hierarchy):
    rows of {module, n_params, bytes}, insertion-ordered."""
    groups: Dict[str, Dict] = {}
    for path, leaf in _leaves_with_paths(params):
        if not hasattr(leaf, "shape"):
            continue
        prefix = "/".join(path.split("/")[:depth]) or "(root)"
        g = groups.setdefault(prefix, {"module": prefix, "n_params": 0, "bytes": 0})
        n = prod(leaf.shape) if leaf.shape else 1
        g["n_params"] += int(n)
        g["bytes"] += int(n) * leaf.dtype.itemsize
    return list(groups.values())


def _shape_leaves(tree) -> List[Tuple[tuple, Any]]:
    import jax

    return [
        (tuple(x.shape), x.dtype)
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "shape")
    ]


def summarize_model(module, rngs, *args, depth: int = 2, **kwargs) -> str:
    """Summary table for a flax module: per-module param counts (grouped at
    `depth` levels of the hierarchy), output shapes, and the torchsummary
    footprint block — computed entirely by abstract evaluation.

    `rngs` and `*args/**kwargs` are exactly what `module.init` takes
    (arrays may be real or ShapeDtypeStructs).
    """
    import jax

    variables = jax.eval_shape(lambda: module.init(rngs, *args, **kwargs))
    outputs = jax.eval_shape(lambda v: module.apply(v, *args, **kwargs), variables)

    # table spans every collection: params (trainable) + batch_stats etc.
    rows = []
    for coll in variables:
        coll_rows = param_summary(variables[coll], depth=depth)
        if coll != "params":
            for r in coll_rows:
                r["module"] = f"{coll}/{r['module']}"
        rows.extend(coll_rows)
    name = type(module).__name__
    w_mod = max([len(r["module"]) for r in rows] + [12])
    lines = ["-" * (w_mod + 30)]
    lines.append(f"{'Module':<{w_mod}}  {'Param #':>12}  {'Bytes':>12}")
    lines.append("=" * (w_mod + 30))
    for r in rows:
        lines.append(
            f"{r['module']:<{w_mod}}  {r['n_params']:>12,}  {r['bytes']:>12,}"
        )
    lines.append("=" * (w_mod + 30))

    total_params = sum(r["n_params"] for r in rows)
    total_param_bytes = sum(r["bytes"] for r in rows)
    # collection params counts as trainable; batch_stats etc. as non-trainable
    trainable = sum(
        r["n_params"]
        for r in param_summary(variables.get("params", {}), depth=depth)
    )
    in_bytes = sum(
        prod(s) * dt.itemsize for s, dt in _shape_leaves((args, kwargs))
    )
    out_elems = sum(prod(s) for s, _ in _shape_leaves(outputs))
    out_shapes = ", ".join(
        "x".join(map(str, s)) or "scalar" for s, _ in _shape_leaves(outputs)
    )
    mb = 1024.0 ** 2
    lines.append(f"Model: {name}")
    lines.append(f"Output shape(s): {out_shapes}")
    lines.append(f"Total params: {total_params:,}")
    lines.append(f"Trainable params: {trainable:,}")
    lines.append(f"Non-trainable params: {total_params - trainable:,}")
    lines.append("-" * (w_mod + 30))
    lines.append(f"Input size (MB): {in_bytes / mb:.2f}")
    # x2 for gradients, matching torchsummary.py:105-106's estimate
    lines.append(f"Forward/backward pass size (MB): {2 * out_elems * 4 / mb:.2f}")
    lines.append(f"Params size (MB): {total_param_bytes / mb:.2f}")
    lines.append("-" * (w_mod + 30))
    return "\n".join(lines)
