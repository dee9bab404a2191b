"""Tracing and profiling utilities (aux subsystem).

The reference's only instrumentation is ad-hoc ``time.time()`` deltas and
items/s prints (reference examples/sample_annotated_rnd.py:43, 72-74 —
SURVEY.md §5 'Tracing / profiling: none'). Here:

* ``trace(logdir)`` — capture an XLA device trace (TensorBoard/Perfetto
  viewable) around any block,
* ``annotate(name)`` — name a region inside a trace,
* ``StageTimer`` — lightweight per-stage wall-clock accounting with an
  items/s report, for the host-side loops the device trace doesn't cover.

Important platform note: on tunneled TPU platforms ``block_until_ready`` may
return before execution completes — ``StageTimer.stop`` therefore accepts an
optional array whose scalar is fetched to force real completion.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_trace: bool = False):
    """Capture a jax.profiler device trace around the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_trace=create_perfetto_trace)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for device traces (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating per-stage wall-clock timer with items/s reporting."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.items: dict[str, int] = defaultdict(int)
        self._open: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                _force_completion(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1
            self.items[name] += items

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t = self.totals[name]
            line = f"{name}: {t:.3f}s over {self.counts[name]} calls"
            if self.items[name]:
                line += f" ({self.items[name] / t:,.0f} items/s)"
            lines.append(line)
        return "\n".join(lines)

    def print_report(self) -> None:
        print(self.report())


def _force_completion(x) -> None:
    """Ensure a device value has really finished computing (fetches a scalar;
    robust where block_until_ready is unreliable)."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves(x)
    if leaves:
        jnp.asarray(leaves[0]).ravel()[:1].block_until_ready()
        float(jnp.asarray(leaves[0]).ravel()[0])
