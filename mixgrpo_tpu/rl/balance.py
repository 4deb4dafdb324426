"""Positive/negative advantage sample reordering.

Parity with zqqqqz2000/MixGRPO fastvideo/models/reward_model/utils.py:18-48
(``balance_pos_neg``): either a full shuffle (``use_random=True``) or an
interleaving of positive- and negative-advantage samples so gradient
accumulation microbatches see balanced signs.  Operates on *indices* (the
TPU-native trainer reorders device arrays by gather instead of shuffling a
Python list of dicts).
"""

from __future__ import annotations

import numpy as np


def balance_pos_neg(advantages, rng: np.random.Generator, use_random: bool = False):
    """Return a permutation of ``range(len(advantages))``.

    ``use_random=True``: uniform shuffle.  Otherwise: shuffle positives and
    negatives independently, interleave starting with the smaller sign
    group, and append the remainder (zero-advantage samples keep their
    position semantics of the reference, which drops them from both groups —
    they are appended at the end here to avoid losing samples).
    """
    adv = np.asarray(advantages)
    n = adv.shape[0]
    idx = np.arange(n)
    if use_random:
        perm = idx.copy()
        rng.shuffle(perm)
        return perm

    pos = idx[adv > 0]
    neg = idx[adv < 0]
    zero = idx[adv == 0]
    rng.shuffle(pos)
    rng.shuffle(neg)
    small, large = (pos, neg) if len(pos) < len(neg) else (neg, pos)
    out = []
    for i in range(len(small)):
        out.append(small[i])
        out.append(large[i])
    out.extend(large[len(small):])
    out.extend(zero)
    return np.asarray(out, dtype=np.int64)
