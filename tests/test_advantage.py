"""Advantage computation, reward mixing, PPO loss, and sample balancing."""

import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.rl.advantage import (
    global_advantages,
    group_advantages,
    masked_mix_rewards,
    mix_advantages,
    mix_rewards,
)
from mixgrpo_tpu.rl.balance import balance_pos_neg
from mixgrpo_tpu.rl.ppo import PPOConfig, ppo_loss


def _np_group_adv(r, G, trimmed=0.0, eps=1e-8):
    """Independent numpy golden mirroring train_grpo_flux.py:440-491."""
    r = np.asarray(r, dtype=np.float64)
    out = np.zeros_like(r)
    for i in range(len(r) // G):
        g = r[i * G : (i + 1) * G]
        if trimmed > 0:
            s = np.sort(g)
            trim = min(int(G * trimmed), G - 1)
            t = s[trim:]
            m, sd = t.mean(), t.std(ddof=1) + eps
        else:
            m, sd = g.mean(), g.std(ddof=1) + eps
        out[i * G : (i + 1) * G] = (g - m) / sd
    return out


def test_group_advantages_matches_loop():
    rng = np.random.default_rng(0)
    r = rng.normal(size=24).astype(np.float32)
    got = np.asarray(group_advantages(jnp.asarray(r), 12))
    np.testing.assert_allclose(got, _np_group_adv(r, 12), rtol=1e-4)


def test_group_advantages_trimmed():
    rng = np.random.default_rng(1)
    r = rng.normal(size=36).astype(np.float32)
    got = np.asarray(group_advantages(jnp.asarray(r), 12, trimmed_ratio=0.25))
    np.testing.assert_allclose(got, _np_group_adv(r, 12, trimmed=0.25), rtol=1e-4)


def test_global_advantages():
    r = jnp.asarray([1.0, 2.0, 3.0])
    gathered = jnp.asarray([0.0, 2.0, 4.0, 2.0])
    got = np.asarray(global_advantages(r, gathered))
    want = (np.asarray(r) - 2.0) / (np.asarray(gathered).std(ddof=1) + 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mix_advantages_weighted_sum():
    rng = np.random.default_rng(2)
    rd = {
        "hps": jnp.asarray(rng.normal(size=24).astype(np.float32)),
        "pick": jnp.asarray(rng.normal(size=24).astype(np.float32)),
    }
    w = {"hps": 1.0, "pick": 0.5}
    got = np.asarray(mix_advantages(rd, w, 12))
    want = _np_group_adv(np.asarray(rd["hps"]), 12) + 0.5 * _np_group_adv(
        np.asarray(rd["pick"]), 12
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mix_rewards():
    rd = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([3.0, 4.0])}
    got = np.asarray(mix_rewards(rd, {"a": 2.0, "b": 1.0}))
    np.testing.assert_allclose(got, [5.0, 8.0])


def test_masked_mix_rewards_drops_failures():
    rd = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([3.0, 100.0])}
    sd = {"a": jnp.asarray([1.0, 1.0]), "b": jnp.asarray([1.0, 0.0])}
    got = np.asarray(masked_mix_rewards(rd, sd, {"a": 1.0, "b": 1.0}))
    # sample 0: both ok -> 4.0; sample 1: only a -> 2.0 rescaled by 2/1 = 4.0
    np.testing.assert_allclose(got, [4.0, 4.0])


def test_ppo_loss_golden():
    """Manual recomputation of train_grpo_flux.py:560-583."""
    new_lp = jnp.asarray([[0.1, 0.2], [-0.1, 0.0]])
    old_lp = jnp.asarray([[0.0, 0.0], [0.0, 0.0]])
    adv = jnp.asarray([[2.0], [-7.0]])  # second clamps to -5
    cfg = PPOConfig(clip_range=0.05, adv_clip_max=5.0, kl_coeff=0.1)
    loss, m = ppo_loss(new_lp, old_lp, adv, cfg, loss_scale=0.5)

    a = np.asarray([[2.0, 2.0], [-5.0, -5.0]])
    ratio = np.exp(np.asarray(new_lp))
    unc = -a * ratio
    cl = -a * np.clip(ratio, 0.95, 1.05)
    policy = np.maximum(unc, cl).mean() * 0.5
    kl = (0.5 * np.asarray(new_lp) ** 2).mean() * 0.5
    np.testing.assert_allclose(float(m["policy_loss"]), policy, rtol=1e-5)
    np.testing.assert_allclose(float(m["kl_loss"]), kl, rtol=1e-5)
    np.testing.assert_allclose(float(loss), policy + 0.1 * kl, rtol=1e-5)
    # ratios 1.105, 1.221, 0.905, 1.0 -> |r-1|>0.05 for 3 of 4
    np.testing.assert_allclose(float(m["clip_frac"]), 0.75, rtol=1e-6)


def test_ppo_loss_mask():
    new_lp = jnp.asarray([[0.5, 99.0]])
    old_lp = jnp.zeros((1, 2))
    adv = jnp.asarray([[1.0]])
    cfg = PPOConfig(clip_range=0.1, adv_clip_max=5.0)
    mask = jnp.asarray([[True, False]])
    _, m = ppo_loss(new_lp, old_lp, adv, cfg, mask=mask)
    assert np.isfinite(float(m["loss"]))
    # only the first element contributes
    want = max(-np.exp(0.5), -1.1)
    np.testing.assert_allclose(float(m["policy_loss"]), want, rtol=1e-5)


def test_balance_pos_neg_interleaves():
    adv = np.asarray([1.0, 2.0, 3.0, -1.0, -2.0, 0.5, 0.7, -0.5])
    rng = np.random.default_rng(0)
    perm = balance_pos_neg(adv, rng)
    assert sorted(perm.tolist()) == list(range(8))
    signs = np.sign(adv[perm])
    # 3 negatives, 5 positives -> first 6 entries alternate starting with neg
    assert list(signs[:6]) == [-1, 1, -1, 1, -1, 1]
    assert (signs[6:] == 1).all()


def test_balance_pos_neg_random_is_permutation():
    adv = np.arange(10) - 5.0
    rng = np.random.default_rng(1)
    perm = balance_pos_neg(adv, rng, use_random=True)
    assert sorted(perm.tolist()) == list(range(10))


# ---------------------------------------------------------------------------
# success-masked advantages (VERDICT r1 item 3)
# ---------------------------------------------------------------------------


def test_masked_group_advantages_all_success_matches_unmasked():
    rng = np.random.default_rng(5)
    r = rng.normal(size=24).astype(np.float32)
    s = np.ones_like(r)
    from mixgrpo_tpu.rl.advantage import masked_group_advantages

    for trim in (0.0, 0.25):
        got = np.asarray(
            masked_group_advantages(jnp.asarray(r), jnp.asarray(s), 12, trim)
        )
        want = np.asarray(group_advantages(jnp.asarray(r), 12, trim))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_masked_group_advantages_excludes_failures():
    from mixgrpo_tpu.rl.advantage import masked_group_advantages

    G = 6
    r = np.asarray([1.0, 2.0, 3.0, 100.0, 4.0, 5.0], np.float32)
    s = np.asarray([1, 1, 1, 0, 1, 1], np.float32)  # garbage score masked
    got = np.asarray(masked_group_advantages(jnp.asarray(r), jnp.asarray(s), G))
    # failed sample contributes 0 advantage
    assert got[3] == 0.0
    # stats over successes only
    ok = np.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
    want = (ok - ok.mean()) / (ok.std(ddof=1) + 1e-8)
    np.testing.assert_allclose(np.delete(got, 3), want, rtol=1e-4)


def test_masked_mix_advantages_failed_model_ignored():
    """One model fails on half the batch; those samples' merged advantages
    must equal the other model's advantage alone (rescaled)."""
    from mixgrpo_tpu.rl.advantage import (
        masked_group_advantages, masked_mix_advantages,
    )

    rng = np.random.default_rng(7)
    G = 4
    ra = rng.normal(size=8).astype(np.float32)
    rb = rng.normal(size=8).astype(np.float32)
    sa = np.ones(8, np.float32)
    sb = np.asarray([1, 0, 1, 0, 1, 0, 1, 0], np.float32)  # b fails half
    w = {"a": 1.0, "b": 1.0}
    merged = np.asarray(
        masked_mix_advantages(
            {"a": jnp.asarray(ra), "b": jnp.asarray(rb)},
            {"a": jnp.asarray(sa), "b": jnp.asarray(sb)},
            w, G,
        )
    )
    adv_a = np.asarray(masked_group_advantages(jnp.asarray(ra), jnp.asarray(sa), G))
    adv_b = np.asarray(masked_group_advantages(jnp.asarray(rb), jnp.asarray(sb), G))
    # failed samples: only model a contributes, rescaled to total weight 2
    fail = sb == 0
    np.testing.assert_allclose(merged[fail], adv_a[fail] * 2.0, rtol=1e-4)
    # successful samples: plain weighted sum
    np.testing.assert_allclose(
        merged[~fail], (adv_a + adv_b)[~fail], rtol=1e-4, atol=1e-6
    )


def test_masked_mix_rewards_all_success_is_plain_mix():
    rng = np.random.default_rng(8)
    rd = {
        "a": jnp.asarray(rng.normal(size=6).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=6).astype(np.float32)),
    }
    sd = {k: jnp.ones(6) for k in rd}
    w = {"a": 0.7, "b": 0.3}
    np.testing.assert_allclose(
        np.asarray(masked_mix_rewards(rd, sd, w)),
        np.asarray(mix_rewards(rd, w)),
        rtol=1e-5,
    )
