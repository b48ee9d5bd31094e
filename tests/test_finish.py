"""Finish (pseudomolecule layout) tests."""

import numpy as np

from reveal_tpu.core.encoding import rc_str
from reveal_tpu.core.io_fasta import fasta_reader, fasta_writer
from reveal_tpu.transform.finish import FinishConfig, finish


def test_finish_orders_and_orients(tmp_path):
    rng = np.random.default_rng(9)
    chrom = "".join(rng.choice(list("ACGT"), size=9000))
    reffa = str(tmp_path / "ref.fa")
    fasta_writer(reffa, [("chr1", chrom)])

    # contigs: shuffled pieces, one reverse-complemented, one junk
    c1 = chrom[0:3000]
    c2 = chrom[3100:6000]
    c3 = rc_str(chrom[6100:9000])
    junk = "".join(rng.choice(list("ACGT"), size=1500))
    ctgfa = str(tmp_path / "ctg.fa")
    fasta_writer(
        ctgfa,
        [("c2", c2), ("c3rc", c3), ("c1", c1), ("junk", junk)],
    )

    out = str(tmp_path / "asm")
    cfg = FinishConfig(
        minlength=20, mincluster=30, minchainsum=30, cutn=0,
        mineventsize=200, backend="np",
    )
    fa, unplaced = finish(reffa, ctgfa, cfg, output=out)

    recs = dict(fasta_reader(fa))
    assert len(recs) == 1
    pseudo = next(iter(recs.values()))
    # contigs must appear in reference order and orientation
    p1 = pseudo.find(c1[50:150])
    p2 = pseudo.find(c2[50:150])
    p3 = pseudo.find(rc_str(c3)[50:150])  # reoriented
    assert -1 not in (p1, p2, p3)
    assert p1 < p2 < p3
    # gaps are N runs
    assert "N" in pseudo

    un = dict(fasta_reader(unplaced))
    assert set(un) == {"junk"}


def test_finish_chains_splits_chimeric_contig(tmp_path):
    """VERDICT round-1 'done' criterion: a deliberately misjoined draft
    contig must be split across two chromosomes by the chain
    decomposition (transformold.py:801-971 semantics)."""
    rng = np.random.default_rng(21)
    chrA = "".join(rng.choice(list("ACGT"), size=8000))
    chrB = "".join(rng.choice(list("ACGT"), size=8000))
    reffa = str(tmp_path / "ref.fa")
    fasta_writer(reffa, [("chrA", chrA), ("chrB", chrB)])

    # chimeric: first half from chrA, second half from chrB (rc)
    chimer = chrA[1000:5000] + rc_str(chrB[2000:6000])
    # plus an honest contig and unchained tail sequence
    honest = chrB[6200:7800]
    junktail = "".join(rng.choice(list("ACGT"), size=1200))
    ctgfa = str(tmp_path / "ctg.fa")
    fasta_writer(
        ctgfa,
        [("chimer", chimer), ("honest", honest + junktail)],
    )

    out = str(tmp_path / "asm")
    cfg = FinishConfig(
        minlength=20, mincluster=30, minchainsum=300, cutn=0,
        order="chains", extiter=1, backend="np",
    )
    fa, unplaced = finish(reffa, ctgfa, cfg, output=out)

    recs = dict(fasta_reader(fa))
    assert len(recs) == 2, recs.keys()
    byref = {
        ("chrA" if "chrA" in k else "chrB"): v for k, v in recs.items()
    }
    # the chrA part of the chimer landed on chrA's pseudomolecule ...
    assert byref["chrA"].find(chrA[1200:1400]) != -1
    # ... its chrB part (re-oriented to forward) on chrB's
    assert byref["chrB"].find(chrB[2200:2400]) != -1
    assert byref["chrA"].find(chrB[2200:2400]) == -1
    # the honest contig is on chrB too
    assert byref["chrB"].find(honest[100:300]) != -1
    # the junk tail of 'honest' is reported as unchained sequence
    un = dict(fasta_reader(unplaced))
    assert any(junktail[100:300] in s for s in un.values()), un.keys()


def test_finish_chains_graph_output(tmp_path):
    """--graph emits a GFA with the transformed layout path plus
    '*'-prefixed original-contig paths (transformold.py:500-695)."""
    import gzip

    rng = np.random.default_rng(23)
    chrA = "".join(rng.choice(list("ACGT"), size=6000))
    reffa = str(tmp_path / "ref.fa")
    fasta_writer(reffa, [("chrA", chrA)])
    # one contig with an internal inversion -> two chains, one event
    ctg = chrA[0:2500] + rc_str(chrA[2600:5200])
    ctgfa = str(tmp_path / "ctg.fa")
    fasta_writer(ctgfa, [("ctg1", ctg)])

    out = str(tmp_path / "asmg")
    cfg = FinishConfig(
        minlength=20, mincluster=30, minchainsum=300, cutn=0,
        order="chains", extiter=0, outputtype="graph", backend="np",
    )
    gfa, _ = finish(reffa, ctgfa, cfg, output=out)
    opener = gzip.open if gfa.endswith(".gz") else open
    with opener(gfa, "rt") as f:
        lines = f.read().strip().split("\n")
    paths = [l.split("\t")[1] for l in lines if l.startswith("P")]
    assert any(p.startswith("*") for p in paths), paths
    assert any(not p.startswith("*") for p in paths), paths


def test_joinchains_and_addunchained():
    """Unit semantics of joinchains/addunchained
    (transformold.py:735-799)."""
    from reveal_tpu.transform.finish import addunchained, joinchains

    # two consecutive chains of ctg 'c' on ref 'r': ci 0 then 1
    ref2ctg = {
        "r": [
            ("c", 0, 100, 0, 900, 0, 950, 2000, 0),
            ("c", 0, 80, 1000, 1900, 1000, 1950, 2000, 1),
        ],
    }
    ctg2ref = {
        "c": [
            ("r", 0, 100, 0, 900, 0, 950, 2000, 0),
            ("r", 0, 80, 1000, 1900, 1000, 1950, 2000, 1),
        ],
    }
    jr, jc = joinchains(ref2ctg, ctg2ref, {"r": 2000}, {"c": 2000})
    assert len(jr["r"]) == 1
    c = jr["r"][0]
    assert c[2] == 180 and c[3] == 0 and c[4] == 1900
    assert c[5] == 0 and c[6] == 1950

    addunchained(jr, jc, {"c": 2000})
    assert jr["unchained"]["c"] == [(1950, 2000)]
