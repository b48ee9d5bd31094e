"""Comparative-harness tests (simulate.py:79-443 equivalents)."""

import os
import pickle

import numpy as np
import pytest

from reveal_tpu.utils.simulate import (
    EvalResult,
    compare_tools,
    load_seqids,
    print_results,
    score_gfa,
    simulate_population,
    summarize,
    write_population,
)


def test_compare_tools_reveal_pipeline(tmp_path):
    """Full rem->unzip->refine pipeline via subprocess, scored against
    tracked ancestry, pickled like the reference harness."""
    wd = str(tmp_path)
    pkl = os.path.join(wd, "perf.pkl")
    results = compare_tools(
        tools=("reveal",), n=3, length=4000, seed=3, workdir=wd,
        pickle_to=pkl, minlength=15,
    )
    r = results["reveal"]
    assert isinstance(r, EvalResult), r
    assert r.mean_f1 > 0.9
    assert r.runtime > 0
    with open(pkl, "rb") as f:
        data = pickle.load(f)
    assert data["reveal"]["mean_f1"] == r.mean_f1
    s = summarize(r.per_pair)
    assert 0 < s["f1"] <= 1
    print_results(results)


def test_compare_tools_missing_external(tmp_path):
    """Absent external aligners are recorded as errors, not crashes
    (mugsy/pecan are not shipped in this image, as in the reference's
    environment expectations)."""
    import shutil

    if shutil.which("mugsy") or shutil.which("pecan"):
        pytest.skip("external aligners unexpectedly present")
    results = compare_tools(
        tools=("mugsy", "pecan"), n=2, length=1500, seed=1,
        workdir=str(tmp_path),
    )
    assert all(isinstance(r, Exception) for r in results.values())


def test_seqids_roundtrip(tmp_path):
    pop = simulate_population(3, 2000, seed=5)
    write_population(str(tmp_path), pop)
    samples = load_seqids(str(tmp_path))
    assert set(samples) == {p[0] for p in pop}
    for name, seq, ids in pop:
        assert np.array_equal(samples[name], ids)
