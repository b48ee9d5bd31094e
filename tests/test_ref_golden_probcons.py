"""Golden differential tests against the REFERENCE ProbCons engine
(probcons/Probcons.cc compiled in place by refbench/build.sh):

* pairwise posteriors: the reference's fwd/bwd/posterior DP
  (ProbabilisticModel.h:102,194,302) vs our LOG_ADD-compat scalar path
  (hmm/compat.posterior_compat — the same lookup-table arithmetic);
* full DoAlign at refinement=0 (deterministic: consistency + guide
  tree + progressive MEA; the refinement stage draws rand() bipartitions
  whose stream we deliberately do not replicate) vs probcons_align in
  compat mode — aligned rows compared string-exact.

Fixtures are generated once from seeded inputs and checked in
(tests/fixtures/ref_golden/probcons.*); regeneration requires
/root/reference.
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures", "ref_golden")
PFX = os.path.join(FIXDIR, "probcons")


def _gen_pairs():
    rng = np.random.default_rng(42)
    pairs = []
    for L in (12, 37, 80, 150):
        a = "".join(rng.choice(list("ACGT"), size=L))
        b = list(a)
        for _ in range(max(1, L // 12)):
            i = int(rng.integers(0, len(b)))
            r = rng.random()
            if r < 0.6:
                b[i] = "ACGT"[int(rng.integers(0, 4))]
            elif r < 0.8 and len(b) > 2:
                del b[i]
            else:
                b.insert(i, "ACGT"[int(rng.integers(0, 4))])
        pairs.append((a, "".join(b)))
    return pairs


def _gen_bubbles():
    rng = np.random.default_rng(7)
    bubbles = []
    for nall, L in ((2, 40), (3, 60), (4, 90), (5, 35)):
        base = "".join(rng.choice(list("ACGT"), size=L))
        alleles = [("s0", base)]
        for s in range(1, nall):
            b = list(base)
            for _ in range(max(1, L // 15)):
                i = int(rng.integers(0, len(b)))
                r = rng.random()
                if r < 0.6:
                    b[i] = "ACGT"[int(rng.integers(0, 4))]
                elif r < 0.8 and len(b) > 2:
                    del b[i]
                else:
                    b.insert(i, "ACGT"[int(rng.integers(0, 4))])
            alleles.append(("s%d" % s, "".join(b)))
        bubbles.append(alleles)
    return bubbles


def _exe():
    exe = os.path.join(REPO, "refbench", "refprobcons")
    if not os.path.exists(exe):
        if not os.path.exists("/root/reference/probcons"):
            pytest.skip("reference sources unavailable")
        subprocess.run(
            [os.path.join(REPO, "refbench", "build.sh")],
            check=True,
            capture_output=True,
        )
    return exe


def _ensure_fixtures():
    if os.path.exists(PFX + ".post.txt") and os.path.exists(
        PFX + ".msa.txt"
    ):
        return
    exe = _exe()
    pairfile = os.path.join(FIXDIR, "probcons.pairs.in")
    with open(pairfile, "w") as f:
        for a, b in _gen_pairs():
            f.write("%s\n%s\n" % (a, b))
    subprocess.run(
        [exe, "--posteriors", pairfile, "--fixture", PFX],
        check=True,
        capture_output=True,
    )
    bubfile = os.path.join(FIXDIR, "probcons.bubbles.in")
    with open(bubfile, "w") as f:
        for alleles in _gen_bubbles():
            f.write("#bubble\n")
            for name, seq in alleles:
                f.write(">%s\n%s\n" % (name, seq))
    subprocess.run(
        [
            exe, "--msa", bubfile, "--consistency", "2",
            "--refinement", "0", "--consgap", "1", "--fixture", PFX,
        ],
        check=True,
        capture_output=True,
    )


def _load_posteriors():
    out = []
    with open(PFX + ".post.txt") as fh:
        cur = None
        for line in fh:
            if line.startswith("#pair"):
                _, p, L1, L2 = line.split()
                cur = np.zeros((int(L1) + 1, int(L2) + 1), np.float64)
                out.append(cur)
                r = 1
            else:
                cur[r, 1:] = [float(x) for x in line.split()]
                r += 1
    return out


def _load_msas():
    out = []
    with open(PFX + ".msa.txt") as fh:
        cur = None
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith("#bubble"):
                cur = {"rows": [], "conf": None}
                out.append(cur)
            elif line.startswith("#confidence"):
                cur["conf"] = [int(x) for x in line.split()[1:]]
            elif line.startswith(">"):
                cur["rows"].append([line[1:], None])
            elif cur is not None and cur["rows"]:
                cur["rows"][-1][1] = line
    return out


def test_posteriors_match_reference_probcons():
    _ensure_fixtures()
    from reveal_tpu.hmm.compat import posterior_compat

    ref = _load_posteriors()
    pairs = _gen_pairs()
    assert len(ref) == len(pairs)
    for (a, b), want in zip(pairs, ref):
        got, _tot = posterior_compat(a, b)
        assert got.shape == want.shape
        # the fixture prints %.6f; the compat path replicates the
        # LOG_ADD table arithmetic in the same float32 ops
        assert np.max(np.abs(np.asarray(got) - want)) < 5e-6, (
            len(a), len(b),
        )


def test_msa_refinement0_matches_reference_doalign():
    _ensure_fixtures()
    from reveal_tpu.hmm import msa as msa_mod

    ref = _load_msas()
    bubbles = _gen_bubbles()
    assert len(ref) == len(bubbles)
    msa_mod.set_logadd_compat(True)
    try:
        for alleles, want in zip(bubbles, ref):
            rows, conf = msa_mod.probcons_align(
                alleles, consistency=2, refinement=0, consgap=True
            )
            got = {n: r for n, r in rows}
            wantrows = {n: r for n, r in want["rows"]}
            assert got == wantrows
            assert conf == want["conf"]
    finally:
        msa_mod.set_logadd_compat(False)
