"""Policy container: a named (taskmap, accel/metric) pair.

Capability parity with the reference's RiemannianMotionPolicy base class
(rmp.py:184-206, duplicated rmp2.py:6-29), functionalized: the leaf evaluation
is a pure function of (params, x, ẋ, ctx) so gains/goals are traced pytree
inputs (update them per tick without retracing) and the whole policy set jits.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

Array = Any


@dataclasses.dataclass
class Policy:
    """A single RMP: taskmap fn(q, ctx) -> x (P, d) plus leaf evaluation
    accel_metric(params, x, xd, ctx) -> (a (P, d), M (P, d, d))."""

    name: str
    taskmap: Callable
    accel_metric: Callable
    params: Any = None
    # key into the per-tick context dict (e.g. a collision frame name) for
    # policies whose taskmap/evaluation consume sensed data; None otherwise
    ctx_key: str | None = None

    def evaluate(self, x: Array, xd: Array, params: Any = None,
                 ctx: Any = None):
        """Leaf evaluation (a, M) — reference rmp.py:202-206."""
        p = self.params if params is None else params
        return self.accel_metric(p, x, xd, ctx)

    def with_params(self, **updates) -> "Policy":
        """Return a copy with updated param entries (e.g. a new goal)."""
        new = dict(self.params)
        new.update(updates)
        return dataclasses.replace(self, params=new)
