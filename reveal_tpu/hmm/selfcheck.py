"""Hardware self-check: production pair-HMM kernels vs the float64 oracle.

The refine stage's numbers are only meaningful if the Pallas/XLA posterior
kernels are numerically right on the backend actually used, so bench.py
gates every reported figure on this check (VERDICT round 1: a numerical
regression in the flagship kernels must fail loudly, not surface as
silently wrong refined graphs).  The oracle is the scalar float64 port of
the reference DP (ProbabilisticModel.h:102-331) in hmm.pairhmm.

Also usable as a TPU-gated pytest (tests_tpu/test_pallas_hw.py).
"""

from __future__ import annotations

import numpy as np

# Production kernels run float32 with exact logaddexp; 2e-3 absolute on
# posterior probabilities matches the CPU test suite's tolerance
# (tests/test_pairhmm.py).  The forward/backward log-values grow ~O(L),
# so their f32 rounding error — and hence the posterior error after
# EXP(f+b-tot) — scales with sequence length (measured: ~1.6e-2 at
# L=700, on CPU and TPU alike; the reference's own ScoreType is float32,
# ScoreType.h:44, so it carries the same drift vs a float64 oracle).
POSTERIOR_ATOL = 2e-3
POSTERIOR_ATOL_PER_BASE = 4e-5
LOGPROB_ATOL = 5e-2


def _atol_for(L1: int, L2: int, atol: float) -> float:
    return max(atol, POSTERIOR_ATOL_PER_BASE * max(L1, L2))


def check_posterior_oracle(
    lengths=(23, 57, 180, 511, 700), seed=0, atol=POSTERIOR_ATOL
):
    """Run the production posterior path (hmm.msa.batch_posteriors — Pallas
    on TPU, XLA row-scan elsewhere, including the sparse device->host
    transfer) on random pairs and compare against the float64 scalar
    oracle.

    Returns (max_abs_err, max_logprob_err, backend).  Raises
    AssertionError on any out-of-tolerance cell.  Cells the sparse
    transfer may zero (oracle posterior < cutoff) are checked one-sided.
    """
    import jax

    from .msa import batch_posteriors
    from .pairhmm import posterior_oracle
    from .pairhmm import SPARSE_TRANSFER_MIN_WIDTH  # noqa: F401

    rng = np.random.default_rng(seed)
    pairs = []
    for L in lengths:
        a = "".join(rng.choice(list("ACGT"), size=L))
        b = list(a[: int(L * 0.95)])
        for _ in range(max(1, L // 20)):  # ~5% divergence
            b[int(rng.integers(0, len(b)))] = "ACGT"[int(rng.integers(4))]
        pairs.append((a, "".join(b)))

    out = batch_posteriors(pairs, slice_output=True)
    max_err = 0.0
    max_tot_err = 0.0
    for (a, b), (p, tot) in zip(pairs, out):
        tol = _atol_for(len(a), len(b), atol)
        p_ref, tot_ref = posterior_oracle(a, b)
        p = np.asarray(p, dtype=np.float64)
        assert p.shape == p_ref.shape, (p.shape, p_ref.shape)
        # cells the sparse top-k transfer must carry exactly
        hi = p_ref >= 0.011
        err_hi = float(np.abs(p[hi] - p_ref[hi]).max()) if hi.any() else 0.0
        # everything else may be zeroed but never invented
        lo = ~hi
        err_lo = float(np.maximum(p[lo] - p_ref[lo] - tol, 0).max())
        err = max(err_hi, err_lo)
        terr = abs(float(tot) - float(tot_ref))
        max_err = max(max_err, err)
        max_tot_err = max(max_tot_err, terr)
        assert err <= tol, (
            "posterior mismatch vs float64 oracle: |err|=%.2e > %.0e "
            "(pair lengths %d/%d, backend %s)"
            % (err, tol, len(a), len(b), jax.default_backend())
        )
        assert terr <= LOGPROB_ATOL, (
            "total log-prob mismatch: %.3e (lengths %d/%d)"
            % (terr, len(a), len(b))
        )
    return max_err, max_tot_err, jax.default_backend()
