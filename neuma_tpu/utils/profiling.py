"""Tracing / profiling helpers (SURVEY.md section 5.1).

The reference relies on (disabled) wp.ScopedTimer plus wall-clock epoch
timers; here we expose phase timers that actually synchronize the device
(the tunneled TPU's ``block_until_ready`` is unreliable — sync by
fetching a scalar) and an optional ``jax.profiler`` trace context for
XLA-level timelines.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def device_sync(x=None) -> None:
    """Force completion of pending device work by fetching a scalar."""
    if x is not None:
        leaves = jax.tree_util.tree_leaves(x)
        if leaves:
            _ = float(jnp.asarray(leaves[0]).ravel()[0])
            return
    _ = float(jnp.zeros(()) + 0)


class PhaseTimer:
    """Accumulating named phase timer with device synchronization.

    with timer.phase("sim", out=state): ...
    print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, out=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            device_sync(out)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            c = self.counts[name]
            lines.append(
                f"{name:24s} {t:8.3f}s total  {t / max(c, 1) * 1e3:8.2f} "
                f"ms/call  x{c}"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """Optional jax.profiler trace (open with TensorBoard / xprof).
    No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
