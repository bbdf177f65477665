"""Step-metric aggregation DSL (reference: lumo/core/meter.py, record.py).

``meter.mean.Lall = loss`` selects the aggregation method per key; a
``Record`` folds a stream of meters into running aggregates for an epoch/
stage.  Values may be python scalars, numpy arrays, or jax arrays — jax
arrays are converted lazily (one blocking device→host sync per log flush,
not per step).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

_AGGS = ("mean", "sum", "last", "max", "min", "smean")


def _to_scalar(v: Any) -> Any:
    """Materialize a device value to a python/numpy value."""
    if hasattr(v, "device_buffer") or type(v).__module__.startswith("jax"):
        v = np.asarray(v)
    if isinstance(v, np.ndarray) and v.ndim == 0:
        return v.item()
    return v


class _AggProxy:
    __slots__ = ("_meter", "_agg")

    def __init__(self, meter: "Meter", agg: str):
        object.__setattr__(self, "_meter", meter)
        object.__setattr__(self, "_agg", agg)

    def __setattr__(self, key: str, value: Any):
        self._meter._set(key, value, self._agg)

    def __setitem__(self, key: str, value: Any):
        self._meter._set(key, value, self._agg)


class Meter:
    """One step's metrics. Default aggregation is ``mean``."""

    def __init__(self):
        object.__setattr__(self, "_vals", {})
        object.__setattr__(self, "_aggs", {})

    def _set(self, key: str, value: Any, agg: str):
        self._vals[key] = value
        self._aggs[key] = agg

    def __setattr__(self, key: str, value: Any):
        self._set(key, value, self._aggs.get(key, "mean"))

    def __getattr__(self, key: str):
        if key in _AGGS:
            return _AggProxy(self, key)
        try:
            return self._vals[key]
        except KeyError:
            raise AttributeError(key)

    def __setitem__(self, key, value):
        self.__setattr__(key, value)

    def __getitem__(self, key):
        return self._vals[key]

    def __contains__(self, key):
        return key in self._vals

    def update(self, d: Dict[str, Any]) -> "Meter":
        for k, v in d.items():
            self[k] = v
        return self

    def items(self):
        return self._vals.items()

    def keys(self):
        return self._vals.keys()

    def todict(self) -> Dict[str, Any]:
        return {k: _to_scalar(v) for k, v in self._vals.items()}

    def scalar_items(self):
        return self.todict().items()

    def __repr__(self):
        parts = []
        for k, v in self.todict().items():
            if isinstance(v, float):
                parts.append(f"{k}={v:.5g}")
            else:
                parts.append(f"{k}={v}")
        return " | ".join(parts)


def _is_device(v: Any) -> bool:
    return type(v).__module__.startswith("jax")


class _AggItem:
    """Running aggregate of one key (reference: record.py AggItem).

    Device values accumulate ON DEVICE (async `+`/maximum/minimum) and are
    materialized only in ``value()`` — a per-step ``np.asarray`` would cost
    one blocking device→host round-trip per metric per step, serializing
    the train loop behind the dispatch pipeline."""

    __slots__ = ("agg", "acc", "n", "last")

    def __init__(self, agg: str):
        self.agg = agg
        self.acc = None
        self.n = 0
        self.last = None

    def add(self, v: Any):
        if not _is_device(v):
            v = _to_scalar(v)
        self.last = v
        self.n += 1
        if self.acc is None:
            self.acc = v
            return
        if self.agg in ("mean", "sum", "smean"):
            self.acc = self.acc + v
        elif self.agg in ("max", "min"):
            if _is_device(self.acc) or _is_device(v):
                import jax.numpy as jnp

                op = jnp.maximum if self.agg == "max" else jnp.minimum
                self.acc = op(self.acc, v)
            else:
                self.acc = (max if self.agg == "max" else min)(self.acc, v)
        elif self.agg == "last":
            self.acc = v

    def value(self):
        if self.acc is None:
            return None
        acc = _to_scalar(self.acc)
        if self.agg in ("mean", "smean"):
            return acc / max(self.n, 1)
        return acc


class Record:
    """Aggregates a stage's meters (reference: record.py:47-81)."""

    def __init__(self, stage: str = "train"):
        self.stage = stage
        self._items: Dict[str, _AggItem] = {}

    def record(self, meter: Meter):
        if meter is None:
            return
        if isinstance(meter, dict):
            m = Meter()
            m.update(meter)
            meter = m
        for k, v in meter._vals.items():
            agg = meter._aggs.get(k, "mean")
            item = self._items.get(k)
            if item is None or item.agg != agg:
                item = _AggItem(agg)
                self._items[k] = item
            item.add(v)

    def agg(self) -> Dict[str, Any]:
        return {k: it.value() for k, it in self._items.items()}

    def clear(self):
        self._items.clear()

    def __repr__(self):
        parts = []
        for k, v in self.agg().items():
            if isinstance(v, float):
                parts.append(f"{k}={v:.5g}")
            else:
                parts.append(f"{k}={v}")
        return " | ".join(parts)
