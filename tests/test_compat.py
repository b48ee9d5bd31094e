"""LOG_ADD lookup-table compat mode (ScoreType.h:34-262 emulation)."""

import numpy as np
import pytest

from reveal_tpu.hmm.compat import (
    LOG_ZERO32,
    exp_compat,
    log_add_compat,
    lookup_compat,
    posterior_compat,
)
from reveal_tpu.hmm.pairhmm import posterior_oracle


def test_lookup_approximates_log1pexp():
    """LOOKUP is a coarse polynomial fit of log(exp(x)+1); ScoreType.h
    tolerates ~1e-3 absolute error."""
    for x in np.linspace(0, 7.5, 200):
        got = float(lookup_compat(np.float32(x)))
        want = float(np.log1p(np.exp(x)))
        assert abs(got - want) < 2e-3, (x, got, want)


def test_exp_approximation_and_underflow():
    for x in np.linspace(-15.9, 0, 200):
        got = float(exp_compat(np.float32(x)))
        want = float(np.exp(x))
        assert abs(got - want) < 2e-3, (x, got, want)
    assert exp_compat(np.float32(-17)) == 0.0
    assert abs(float(exp_compat(np.float32(0.5))) - np.exp(0.5)) < 1e-6


def test_log_add_semantics():
    # LOG_ZERO short-circuits exactly (ScoreType.h:258-262)
    assert log_add_compat(LOG_ZERO32, np.float32(-3.0)) == np.float32(-3.0)
    assert log_add_compat(np.float32(-3.0), LOG_ZERO32) == np.float32(-3.0)
    # threshold shortcut: difference >= 7.5 returns the max verbatim
    assert log_add_compat(np.float32(-1.0), np.float32(-9.0)) == np.float32(
        -1.0
    )
    # interior: close to exact logaddexp
    got = float(log_add_compat(np.float32(-1.0), np.float32(-2.0)))
    want = float(np.logaddexp(-1.0, -2.0))
    assert abs(got - want) < 2e-3


def test_posterior_compat_close_to_oracle():
    rng = np.random.default_rng(3)
    base = "".join(rng.choice(list("ACGT"), size=40))
    mut = list(base)
    mut[10] = "T" if mut[10] != "T" else "A"
    del mut[25:28]
    s2 = "".join(mut)
    p_c, tot_c = posterior_compat(base, s2)
    p_o, tot_o = posterior_oracle(base, s2)
    assert p_c.shape == p_o.shape
    # table arithmetic drifts by O(1e-3) per op; posteriors must agree to
    # a loose tolerance and produce the same argmax alignment path
    assert np.max(np.abs(p_c.astype(np.float64) - p_o)) < 0.05
    assert abs(tot_c - tot_o) < 0.5
    am_c = np.argmax(p_c[1:], axis=1)
    am_o = np.argmax(p_o[1:], axis=1)
    assert (am_c == am_o).mean() > 0.9


def test_batch_posteriors_compat_route():
    from reveal_tpu.hmm.pairhmm import batch_posteriors

    pairs = [("ACGTACGTAA", "ACGTCCGTAA"), ("GGGTTT", "GGGTTT")]
    out = batch_posteriors(pairs, compat=True)
    assert len(out) == 2
    for (s1, s2), (p, tot) in zip(pairs, out):
        assert p.shape == (len(s1) + 1, len(s2) + 1)
        assert np.isfinite(tot)
        assert p.max() > 0.5


def test_msa_compat_switch_roundtrip():
    from reveal_tpu.hmm import msa

    msa.set_logadd_compat(True)
    try:
        out = msa.batch_posteriors([("ACGTAC", "ACGTAC")])
        assert out[0][0].shape == (7, 7)
    finally:
        msa.set_logadd_compat(False)
