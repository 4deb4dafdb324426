"""Golden-value tests for the sliding-window scheduler (all 4 strategies)."""

import numpy as np

from mixgrpo_tpu.rl.window import SlidingWindowState


def _trace(state, iters, rng=None):
    out = []
    for _ in range(iters):
        out.append((state.cur_timestep, state.get_current_timesteps()))
        state.update_iteration(rng)
    return out


def test_progressive_golden():
    s = SlidingWindowState(iters_per_group=2, group_size=2, max_timesteps=6)
    starts = [t for t, _ in _trace(s, 8)]
    # 2 iters at 0, 2 at 2, 2 at 4, then clip at 6
    assert starts == [0, 0, 2, 2, 4, 4, 6, 6]


def test_progressive_rollback():
    s = SlidingWindowState(
        iters_per_group=1, group_size=2, max_timesteps=5, roll_back=True
    )
    starts = [t for t, _ in _trace(s, 8)]
    # 0,2,4 then 4+2=6 > 5 -> rollback to 0
    assert starts == [0, 2, 4, 0, 2, 4, 0, 2]


def test_progressive_overlap_stride():
    s = SlidingWindowState(
        iters_per_group=1, group_size=4, max_timesteps=25,
        prog_overlap=True, prog_overlap_step=1,
    )
    starts = [t for t, _ in _trace(s, 5)]
    assert starts == [0, 1, 2, 3, 4]


def test_window_clips_at_max():
    s = SlidingWindowState(iters_per_group=1, group_size=4, max_timesteps=10)
    s.cur_timestep = 8
    assert s.get_current_timesteps() == [8, 9]


def test_random_strategy_bounds():
    s = SlidingWindowState(
        iters_per_group=1, group_size=4, max_timesteps=25, sample_strategy="random"
    )
    rng = np.random.default_rng(0)
    for _ in range(100):
        s.update_iteration(rng)
        assert 0 <= s.cur_timestep <= 21
        w = s.get_current_timesteps()
        assert len(w) == 4 and w[-1] < 25


def test_decay_strategy_budget_shrinks():
    s = SlidingWindowState(
        iters_per_group=8, group_size=2, max_timesteps=10, sample_strategy="decay",
        max_iters_per_group=8, min_iters_per_group=2,
    )
    assert s.current_iters_per_group() == 8
    s.cur_timestep = 10
    assert s.current_iters_per_group() == 2
    s.cur_timestep = 5
    assert s.current_iters_per_group() == 5


def test_exp_decay_budget():
    s = SlidingWindowState(
        iters_per_group=5, group_size=2, max_timesteps=50,
        sample_strategy="exp_decay", exp_decay_thre_timestep=13, exp_decay_k=0.1,
    )
    s.cur_timestep = 10
    assert s.current_iters_per_group() == 5  # before threshold: no decay
    s.cur_timestep = 13 + 20
    want = int(np.ceil(5 * np.exp(-0.1 * 20)))
    assert s.current_iters_per_group() == want


def test_training_complete():
    s = SlidingWindowState(iters_per_group=1, group_size=2, max_timesteps=4)
    assert not s.is_training_complete()
    s.cur_timestep = 4
    assert s.is_training_complete()
    s.sample_strategy = "random"
    assert not s.is_training_complete()


def test_serialization_roundtrip():
    s = SlidingWindowState(
        iters_per_group=25, group_size=4, max_timesteps=25,
        prog_overlap=True, prog_overlap_step=1, roll_back=True,
    )
    for _ in range(40):
        s.update_iteration()
    s2 = SlidingWindowState.from_dict(s.to_dict())
    assert s2 == s
    s.update_iteration()
    s2.update_iteration()
    assert s2 == s
