import numpy as np

from mixgrpo_tpu.solvers.schedule import (
    deterministic_mask,
    flash_post_schedule,
    sd3_time_shift,
    sigma_schedule,
)


def test_time_shift_identity_and_endpoints():
    t = np.linspace(0, 1, 11)
    np.testing.assert_allclose(sd3_time_shift(1.0, t), t)
    assert sd3_time_shift(3.0, 1.0) == 1.0
    assert sd3_time_shift(3.0, 0.0) == 0.0
    # closed form: s*t/(1+(s-1)t)
    assert abs(sd3_time_shift(3.0, 0.5) - (1.5 / 2.0)) < 1e-12


def test_sigma_schedule_shape_and_monotonic():
    s = sigma_schedule(25, shift=3.0)
    assert s.shape == (26,)
    assert s[0] == 1.0 and s[-1] == 0.0
    assert np.all(np.diff(s) < 0)


def test_deterministic_mask():
    det = deterministic_mask(25, [10, 11, 12, 13])
    assert det.sum() == 21
    assert not det[10] and not det[13] and det[9] and det[14]


def test_flash_post_schedule_compression():
    T = 25
    base = sigma_schedule(T, shift=3.0)
    det = deterministic_mask(T, [10, 11, 12, 13])
    sig, n, det_out = flash_post_schedule(base, det, shift=3.0, compress_ratio=0.4)
    # last SDE index 13 -> num_post = int(max((25-13)*0.4, 1)) = 4 post
    # sigma entries -> total entries 14 + 4 = 18 -> 17 steps
    assert n == 17
    assert sig.shape[0] == n + 1
    # prefix preserved
    np.testing.assert_allclose(sig[:14], base[:14])
    assert sig[-1] == 0.0
    # window steps still SDE, tail all ODE
    assert not det_out[10] and not det_out[13]
    assert det_out[14:].all()


def test_flash_post_schedule_padding():
    T = 25
    base = sigma_schedule(T, shift=3.0)
    det = deterministic_mask(T, [20, 21, 22, 23])
    sig, n, det_out = flash_post_schedule(
        base, det, shift=3.0, compress_ratio=0.2, pad_to=T
    )
    assert sig.shape == (T + 1,)
    assert det_out.shape == (T,)
    assert n <= T
    assert det_out[n:].all()
    # entries past the valid n+1 schedule points are zero padding
    np.testing.assert_allclose(sig[n + 1 :], 0.0)


def test_flash_post_schedule_no_window():
    T = 10
    base = sigma_schedule(T, shift=3.0)
    det = np.ones(T, dtype=bool)
    sig, n, _ = flash_post_schedule(base, det, shift=3.0, compress_ratio=0.4)
    assert n == T
    np.testing.assert_allclose(sig, base)
