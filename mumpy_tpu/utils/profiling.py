"""Profiling and cost analysis.

The reference's only perf affordances are analytic ``flops()`` methods on its
attention/block classes (``swinTransformer.py:171-182,313-325,372-376,445-451``)
and wall-clock prints (``train.py:402-412``).  The TPU-native equivalents here are
stronger: XLA's own compiled cost analysis (exact FLOPs/bytes for any jitted
callable) and ``jax.profiler`` device traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax

__all__ = ["cost_analysis", "model_flops", "trace", "StepTimer"]


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compile ``fn`` for the given args and return XLA's cost analysis
    (keys include ``flops``, ``bytes accessed``, ``transcendentals``)."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    return dict(compiled.cost_analysis() or {})


def model_flops(model, params, *inputs, **apply_kwargs) -> float:
    """Forward FLOPs of a flax model — the counterpart of the reference's
    hand-derived per-module ``flops()`` sums, but measured on the real program."""
    cost = cost_analysis(
        lambda *a: model.apply(params, *a, **apply_kwargs), *inputs
    )
    return float(cost.get("flops", 0.0))


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed block (open in TensorBoard's
    profile plugin or Perfetto).  Usage::

        with trace("/tmp/profile"):
            jax.block_until_ready(step(...))
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup discard (``train.py:402-412``-style
    prints but with device synchronization)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._t0: Optional[float] = None
        self._n = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result: Any = None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")
