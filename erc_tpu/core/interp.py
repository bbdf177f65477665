"""Value-interpolation curves (reference: lumo/core/interp.py:87-412).

Each curve is a pure ``f(step) -> value`` callable, so it slots directly
into ``optax.scale_by_schedule`` / ``optax.inject_hyperparams`` — the
TPU-idiomatic replacement for mutating optimizer ``param_groups``.
"""

from __future__ import annotations

import math
from typing import List


class Interp:
    def __init__(self, start: float, end: float, left: float = 0, right: float = 1):
        self.start, self.end = float(start), float(end)
        self.left, self.right = float(left), float(right)

    def _ratio(self, step) -> float:
        if self.right <= self.left:
            return 1.0
        r = (float(step) - self.left) / (self.right - self.left)
        return min(max(r, 0.0), 1.0)

    def interp(self, r: float) -> float:
        raise NotImplementedError

    def __call__(self, step) -> float:
        return self.interp(self._ratio(step))

    # `scale`/`apply` in the reference mutated optimizer groups; here the
    # curve itself is the schedule function.
    def scale(self, base: float, step) -> float:
        return base * self(step)


class Constant(Interp):
    def __init__(self, value: float):
        super().__init__(value, value)

    def interp(self, r):
        return self.start


class Linear(Interp):
    def interp(self, r):
        return self.start + (self.end - self.start) * r


class Cos(Interp):
    def interp(self, r):
        return self.end + (self.start - self.end) * (1 + math.cos(math.pi * r)) / 2


class Exp(Interp):
    def interp(self, r):
        return self.start + (self.end - self.start) * (math.exp(5 * r) - 1) / (math.e**5 - 1)


class Log(Interp):
    def interp(self, r):
        return self.start + (self.end - self.start) * math.log(1 + r * (math.e - 1))


class PowerDecay(Interp):
    def __init__(self, start: float, decay: float, period: float):
        super().__init__(start, 0)
        self.decay, self.period = decay, period

    def __call__(self, step):
        return self.start * (self.decay ** (float(step) / self.period))


class PeriodCos(Interp):
    def __init__(self, start, end, period):
        super().__init__(start, end, 0, period)
        self.period = float(period)

    def __call__(self, step):
        r = (float(step) % self.period) / self.period
        return self.end + (self.start - self.end) * (1 + math.cos(2 * math.pi * r)) / 2


class HalfPeriodCos(Interp):
    def __init__(self, start, end, period):
        super().__init__(start, end, 0, period)
        self.period = float(period)

    def __call__(self, step):
        r = (float(step) % self.period) / self.period
        return self.end + (self.start - self.end) * (1 + math.cos(math.pi * r)) / 2


class PeriodTriangle(Interp):
    def __init__(self, start, end, period):
        super().__init__(start, end, 0, period)
        self.period = float(period)

    def __call__(self, step):
        r = (float(step) % self.period) / self.period
        tri = 1 - abs(2 * r - 1)
        return self.start + (self.end - self.start) * tri


class PeriodLinear(Interp):
    def __init__(self, start, end, period):
        super().__init__(start, end, 0, period)
        self.period = float(period)

    def __call__(self, step):
        r = (float(step) % self.period) / self.period
        return self.start + (self.end - self.start) * r


def to_optax_schedule(curve):
    """Convert an Interp curve to a traced-step-safe optax schedule fn.

    The curve classes use python math on floats; under jit the step is a
    traced array, so known curves are re-expressed with jnp ops (the
    generic fallback evaluates pointwise via a table — exact for every
    curve at integer steps up to its horizon).
    """
    import jax.numpy as jnp

    if isinstance(curve, Constant):
        return lambda step: jnp.asarray(curve.start)
    if isinstance(curve, Linear):
        def lin(step):
            r = jnp.clip((step - curve.left) / max(curve.right - curve.left, 1e-9), 0, 1)
            return curve.start + (curve.end - curve.start) * r
        return lin
    if isinstance(curve, Cos):
        def cos(step):
            r = jnp.clip((step - curve.left) / max(curve.right - curve.left, 1e-9), 0, 1)
            return curve.end + (curve.start - curve.end) * (1 + jnp.cos(jnp.pi * r)) / 2
        return cos
    if isinstance(curve, PowerDecay):
        return lambda step: curve.start * (curve.decay ** (step / curve.period))

    # generic: precomputed table lookup (horizon = right bound or period)
    horizon = int(getattr(curve, "right", 0) or getattr(curve, "period", 0) or 1000) + 1
    import numpy as np

    table = jnp.asarray(np.array([curve(s) for s in range(horizon + 1)], np.float32))

    periodic = getattr(curve, "period", None) is not None and not hasattr(curve, "decay")

    def lookup(step):
        if periodic:
            idx = (step.astype(jnp.int32) if hasattr(step, "astype") else int(step)) % horizon
        else:
            idx = jnp.clip(step, 0, horizon).astype(jnp.int32)
        return table[idx]

    return lookup


class InterpList:
    """Piecewise schedule: list of (curve, until_step) segments."""

    def __init__(self, segments: List[tuple]):
        self.segments = segments

    def __call__(self, step):
        for curve, until in self.segments:
            if float(step) < until:
                return curve(step)
        return self.segments[-1][0](step)
