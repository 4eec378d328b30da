"""Shared math helpers.

Mirrors the role of reference python/t_mac/utils.py:6-13 (alphas, nmse) but
is written for JAX arrays as well as numpy.
"""

from __future__ import annotations

import numpy as np


def get_bits_alphas(bits: int):
    """Bit-plane recombination weights.

    With signed states s' = 2s - 1 for each bit-plane and the s0 = -1 bias
    fold, an n-bit biased-unsigned weight w in [0, 2^n) satisfies

        w - 2^(n-1) = 1/2 (b0' + s0) + b1' + 2 b2' + 4 b3'

    so the per-plane recombination weights are [1/2, 1, 2, 4][:bits].
    (Reference: python/t_mac/utils.py:6-8, ops/qgemm.py:81-83.)
    """
    return [0.5, 1.0, 2.0, 4.0][:bits]


def nmse(a, b) -> float:
    """Normalized mean squared error of b against reference a."""
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    denom = np.mean(np.square(a))
    if denom == 0:
        return float(np.mean(np.square(a - b)))
    return float(np.mean(np.square(a - b)) / denom)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m
