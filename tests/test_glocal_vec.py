"""Differential tests: vectorized glocalchain vs the scalar reference
port (transform.py:947-1180 semantics) on randomized block sets."""

import numpy as np
import pytest

from reveal_tpu.transform.blocks import glocalchain


def _random_blocks(seed, nref=2, nctg=3, per=12):
    """Random synteny blocks over a synthetic ctg2range layout."""
    rng = np.random.default_rng(seed)
    ctg2range = []
    pos = 0
    for _ in range(nref + nctg):
        ln = int(rng.integers(5000, 20000))
        ctg2range.append((pos, pos + ln))
        pos = pos + ln + 1
    rlength = ctg2range[nref - 1][1]
    qlength = pos - 1 - rlength
    blocks = []
    for refid in range(nref):
        for ctgid in range(nref, nref + nctg):
            r0, r1 = ctg2range[refid]
            c0, c1 = ctg2range[ctgid]
            for _ in range(per):
                l = int(rng.integers(50, 800))
                s1 = int(rng.integers(r0, r1 - l))
                s2 = int(rng.integers(c0, c1 - l))
                o = int(rng.integers(0, 2))
                blocks.append(
                    (s1, s1 + l, s2, s2 + l, o, l, refid, ctgid)
                )
    return blocks, rlength, qlength, ctg2range


@pytest.mark.parametrize("seed", [1, 2, 3, 7])
@pytest.mark.parametrize("axis", [0, 1])
def test_vec_matches_scalar(seed, axis):
    blocks, rlength, qlength, ctg2range = _random_blocks(seed)
    kw = dict(rearrangecost=1000, inversioncost=1, _lambda=5, eps=1,
              alfa=1, gapopen=10, axis=axis)
    a = glocalchain(list(blocks), rlength, qlength, ctg2range,
                    vectorized=False, **kw)
    b = glocalchain(list(blocks), rlength, qlength, ctg2range,
                    vectorized=True, **kw)
    assert a == b


@pytest.mark.parametrize("lastn,lastbp", [(3, 500), (5, 2000), (50, 10000)])
def test_vec_matches_scalar_window_limits(lastn, lastbp):
    """Exercise the bounded-window early stop (lastn/lastbp/deepest)."""
    blocks, rlength, qlength, ctg2range = _random_blocks(11, per=25)
    for axis in (0, 1):
        kw = dict(lastn=lastn, lastbp=lastbp, axis=axis)
        a = glocalchain(list(blocks), rlength, qlength, ctg2range,
                        vectorized=False, **kw)
        b = glocalchain(list(blocks), rlength, qlength, ctg2range,
                        vectorized=True, **kw)
        assert a == b


def test_vec_matches_scalar_mixed_costs():
    """Nonzero eps/inversioncost and small rearrangecost to hit every
    cost regime."""
    blocks, rlength, qlength, ctg2range = _random_blocks(23, per=20)
    for axis in (0, 1):
        kw = dict(rearrangecost=120, inversioncost=17, _lambda=2,
                  eps=3, alfa=2, gapopen=0, axis=axis)
        a = glocalchain(list(blocks), rlength, qlength, ctg2range,
                        vectorized=False, **kw)
        b = glocalchain(list(blocks), rlength, qlength, ctg2range,
                        vectorized=True, **kw)
        assert a == b
