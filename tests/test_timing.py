"""Robust timing discipline (mixgrpo_tpu/utils/timing.py).

Round-3 verdict item 5: the bench harness recorded a negative per-call
time (``fwd_ms: -1.425``, bench_results/round3/campaign.log) because the
(0, n, 2n) slope differencing under tunnel jitter was written as-is.
These tests pin the contract: non-monotone triples retry and, when they
never settle, the result says ``valid=False`` instead of a garbage number.
"""

import itertools

from mixgrpo_tpu.utils.timing import SlopeTiming, backend_smoke, robust_slope


def _timed_from_schedule(schedule):
    """timed(m) that pops wall-clock values from a canned schedule."""
    it = iter(schedule)

    def timed(m):
        return next(it)

    return timed


def test_clean_triple_single_attempt():
    # fixed overhead 0.03s, per-iter 0.01s, n=4
    res = robust_slope(_timed_from_schedule([0.03, 0.07, 0.11]), n=4)
    assert res.valid and res.attempts == 1
    assert abs(res.per_iter_s - 0.01) < 1e-9
    assert abs(res.per_iter_ms - 10.0) < 1e-6


def test_negative_slope_retries_then_recovers():
    # attempt 1: t2 < t0 (the round-3 campaign.log failure shape);
    # attempt 2: clean
    sched = [0.10, 0.05, 0.04, 0.03, 0.07, 0.11]
    res = robust_slope(_timed_from_schedule(sched), n=4, retries=3)
    assert res.valid and res.attempts == 2
    assert res.per_iter_s > 0


def test_never_settles_reports_invalid_not_garbage():
    # every triple is non-monotone -> no number, valid=False, reason set
    sched = list(itertools.islice(itertools.cycle([0.10, 0.05, 0.04]), 9))
    res = robust_slope(_timed_from_schedule(sched), n=4, retries=3)
    assert not res.valid
    assert res.per_iter_s is None and res.per_iter_ms is None
    assert res.attempts == 3 and len(res.triples) == 3
    assert "non-monotone" in res.reason


def test_zero_slope_is_invalid():
    res = robust_slope(_timed_from_schedule([0.05, 0.05, 0.05] * 3),
                       n=4, retries=3)
    assert not res.valid
    assert "slope" in res.reason


def test_monotonicity_tolerance_allows_small_jitter():
    # t1 barely above t2 within 2% of t2: still a valid triple
    res = robust_slope(_timed_from_schedule([0.03, 0.1101, 0.110]), n=4)
    assert res.valid


def test_backend_smoke_runs_on_cpu():
    assert backend_smoke() >= 0.0


def test_slope_timing_dataclass_roundtrip():
    st = SlopeTiming(0.002, True, 1, [(0.0, 0.008, 0.016)])
    assert st.per_iter_ms == 2.0


def test_bench_supervisor_json_error_line():
    """bench.py's supervisor emits one parseable JSON error line when every
    attempt fails (here: a child that cannot exist)."""
    import bench

    assert bench._extract_json_line("noise\n{\"a\": 1}\n") == {"a": 1}
    assert bench._extract_json_line("no json at all") is None
    # last JSON-looking line wins; broken trailing line falls back
    assert bench._extract_json_line('{"a": 1}\n{bad') == {"a": 1}
