#!/usr/bin/env python
"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric: pair-HMM posterior throughput (cells/sec) of the refine
stage's hot kernel on the device — the reference's equivalent computation is
ProbCons ComputeForwardMatrix/Backward/Posterior
(/root/reference/probcons/ProbabilisticModel.h:102-331), single-threaded C++.
The reference repo publishes no benchmark numbers (BASELINE.md), so
vs_baseline is reported against a conservative 100 Mcells/s estimate for
single-core C++ pair-HMM forward-backward.

Extra: end-to-end rem anchoring throughput (Mbp/s) on the reference's
tests/2a.fa vs 2b.fa fixtures (3.2 Mbp total), and on 1a/1b.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REF_CELLS_PER_SEC_CPU = 1e8  # conservative single-core C++ pair-HMM estimate


def bench_pairhmm(B=32, L=512, iters=5):
    import jax

    from reveal_tpu.hmm.pairhmm import _get_kernels, _pad_with_dummy

    _, _, _, batched = _get_kernels()
    rng = np.random.default_rng(0)
    seqs1 = ["".join(rng.choice(list("ACGT"), size=L - 10)) for _ in range(B)]
    seqs2 = ["".join(rng.choice(list("ACGT"), size=L - 5)) for _ in range(B)]
    xb = np.stack([_pad_with_dummy(s.encode(), L) for s in seqs1])
    yb = np.stack([_pad_with_dummy(s.encode(), L) for s in seqs2])
    lx = np.array([len(s) for s in seqs1], dtype=np.int32)
    ly = np.array([len(s) for s in seqs2], dtype=np.int32)

    # warmup/compile
    out = batched(xb, yb, lx, ly)
    jax.block_until_ready(out)

    t0 = time.time()
    for _ in range(iters):
        out = batched(xb, yb, lx, ly)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    cells = float(np.sum(lx.astype(np.int64) * ly.astype(np.int64)))
    return cells / dt


def bench_rem(f1, f2):
    from reveal_tpu.align.rem import align_genomes

    t0 = time.time()
    G, idx = align_genomes([f1, f2], minlength=20, backend="np")
    dt = time.time() - t0
    mbp = idx.main.nT / 1e6
    return mbp / dt, dt


def main():
    extra = {}
    try:
        r11, dt11 = bench_rem(
            "/root/reference/tests/1a.fa", "/root/reference/tests/1b.fa"
        )
        extra["rem_1a1b_mbp_per_s"] = round(r11, 3)
    except Exception as e:  # pragma: no cover
        extra["rem_1a1b_error"] = str(e)[:200]
    try:
        r22, dt22 = bench_rem(
            "/root/reference/tests/2a.fa", "/root/reference/tests/2b.fa"
        )
        extra["rem_2a2b_mbp_per_s"] = round(r22, 3)
    except Exception as e:  # pragma: no cover
        extra["rem_2a2b_error"] = str(e)[:200]

    cps = bench_pairhmm()
    extra["pairhmm_batch"] = "B=32,L=512,posterior(fwd+bwd)"

    print(
        json.dumps(
            {
                "metric": "pairhmm_posterior_cells_per_sec",
                "value": round(cps, 1),
                "unit": "cells/s",
                "vs_baseline": round(cps / REF_CELLS_PER_SEC_CPU, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
