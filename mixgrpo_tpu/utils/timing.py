"""Robust device timing under an unreliable dispatch path.

The tunneled axon backend adds a fixed ~28 ms dispatch latency, does not
synchronize on ``block_until_ready``, and occasionally jitters enough that
naive differencing produces garbage (round 3 recorded ``fwd_ms: -1.425``
for a kernel sweep row — a negative time written as-is,
bench_results/round3/campaign.log).  This module centralizes the
measurement discipline every bench script must follow:

- time only scalar host fetches (forces real execution);
- estimate per-iteration cost as the SLOPE over loop lengths (0, n, 2n),
  which cancels the fixed dispatch overhead;
- **validate the triple**: reject non-monotone timings (t0 <= t1 <= t2
  must hold up to a small tolerance) and non-positive slopes, retry up to
  ``retries`` times, and surface ``valid=False`` instead of a poisoned
  number when the tunnel never settles.

Counterpart in the reference: none — it prints raw ``time.time()`` deltas
(fastvideo/train_grpo_flux.py:229-233,272-274).  A framework that makes
perf claims needs measurements that can say "invalid" out loud.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional


@dataclass
class SlopeTiming:
    """Result of :func:`robust_slope`.

    ``per_iter_s`` is None when no valid triple was obtained; consumers
    must check ``valid`` before publishing the number (campaign
    summarizers assert no invalid row reaches a report table).
    """

    per_iter_s: Optional[float]
    valid: bool
    attempts: int
    triples: list  # [(t0, t1, t2), ...] raw wall-clock per attempt
    reason: str = ""

    @property
    def per_iter_ms(self) -> Optional[float]:
        return None if self.per_iter_s is None else self.per_iter_s * 1e3


def robust_slope(
    timed: Callable[[int], float],
    n: int,
    retries: int = 3,
    rel_tol: float = 0.02,
) -> SlopeTiming:
    """Slope-based per-iteration timing with monotonicity validation.

    ``timed(m)`` must run the program for ``m`` iterations and return the
    wall-clock seconds (including a scalar host fetch).  Calls
    ``timed(0), timed(n), timed(2n)``; a valid triple satisfies
    ``t0 <= t1 <= t2`` within ``rel_tol * t2`` slack and yields a strictly
    positive slope ``(t2 - t0) / (2n)``.  Invalid triples are retried.
    """
    assert n > 0
    triples = []
    reason = ""
    for attempt in range(1, retries + 1):
        t0, t1, t2 = timed(0), timed(n), timed(2 * n)
        triples.append((t0, t1, t2))
        slack = rel_tol * max(t2, 1e-9)
        if t1 < t0 - slack or t2 < t1 - slack:
            reason = f"non-monotone triple ({t0:.4f}, {t1:.4f}, {t2:.4f})"
            continue
        slope = (t2 - t0) / (2 * n)
        if slope <= 0:
            reason = f"non-positive slope {slope:.6f}"
            continue
        return SlopeTiming(slope, True, attempt, triples)
    return SlopeTiming(None, False, retries, triples, reason)


def backend_smoke(timeout_s: float = 90.0) -> float:
    """Run a tiny device program end-to-end; returns elapsed seconds.

    Raises whatever the backend raises (initialization failure, wedged
    tunnel surfacing as a hang is bounded by the *caller's* subprocess
    timeout — a wedged tunnel does not raise, it stalls, so in-process
    deadlines cannot catch it).  Used as the pre-flight and post-campaign
    device health check (VERDICT r3 item 1c).
    """
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.ones((256, 256), jnp.bfloat16)
    val = float((x @ x).astype(jnp.float32).sum())
    assert val == 256.0 * 256 * 256, val
    return time.time() - t0
