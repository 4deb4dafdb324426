"""Tracing / profiling helpers.

The reference's observability is manual wall-clock prints
(zqqqqz2000/MixGRPO fastvideo/train_grpo_flux.py:229-233,272-274,533-558 —
SURVEY.md §5 "no torch.profiler/nsys hooks").  Here:

  - ``trace(logdir)``: context manager around ``jax.profiler`` — captures
    XLA device traces viewable in TensorBoard/Perfetto;
  - ``annotate(name)``: TraceAnnotation for custom spans;
  - ``Stopwatch``: wall-clock section timing that *forces device sync*
    via a scalar host fetch (on the tunneled axon backend
    ``block_until_ready`` does not synchronize — see
    .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def force_sync(x=None) -> None:
    """Synchronize with the device by fetching a scalar."""
    if x is None:
        x = jnp.zeros(())
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "astype")]
    if leaves:
        float(jnp.asarray(leaves[0]).astype(jnp.float32).sum())


class Stopwatch:
    """Accumulating section timer (sync'd): ``with sw.section("rollout"):``"""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync_on=None):
        t0 = time.time()
        yield
        force_sync(sync_on)
        dt = time.time() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in self.totals
        }
