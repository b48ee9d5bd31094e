"""Transform (draft-vs-reference layout) tests with synthetic
rearrangements."""

import gzip

import numpy as np

from reveal_tpu.core.encoding import rc_str
from reveal_tpu.core.io_fasta import fasta_writer
from reveal_tpu.core.io_gfa import read_gfa
from reveal_tpu.graph.extract import extract
from reveal_tpu.transform.driver import TransformConfig, transform


def test_transform_translocation_and_inversion(tmp_path):
    rng = np.random.default_rng(5)
    A = "".join(rng.choice(list("ACGT"), size=4000))
    B = "".join(rng.choice(list("ACGT"), size=4000))
    C = "".join(rng.choice(list("ACGT"), size=4000))
    ref = A + B + C
    # query: swap A and B, invert C
    qry = B + A + rc_str(C)

    reffa = str(tmp_path / "ref.fa")
    qryfa = str(tmp_path / "qry.fa")
    fasta_writer(reffa, [("chr1", ref)])
    fasta_writer(qryfa, [("ctg1", qry)])

    cfg = TransformConfig(
        minlength=30,
        minctglength=100,
        mincluster=30,
        minchainsum=30,
        backend="np",
    )
    gfa, bed = transform(reffa, qryfa, cfg, output=str(tmp_path / "out"))
    assert gfa is not None

    # the raw GFA must carry both the reference-layout path and the
    # '*'-prefixed original path (the DiGraph reader drops the latter)
    with gzip.open(gfa, "rt") as f:
        plines = [l for l in f if l.startswith("P")]
    assert any(l.split("\t")[1].startswith("*") for l in plines)
    assert any(not l.split("\t")[1].startswith("*") for l in plines)

    G = read_gfa(gfa)
    refp = [p for p in G.graph["paths"] if not p.startswith("*")]
    assert len(refp) == 1

    # reference-layout path: blocks ordered by reference coordinates with
    # 1bp N gap nodes between them
    rsid = G.graph["path2id"][refp[0]]
    rsegs = []
    for n in G.nodes:
        d = G.nodes[n]
        if not isinstance(n, str) and rsid in d.get("offsets", {}):
            rsegs.append((d["offsets"][rsid], d["seq"]))
    rsegs.sort()
    layout = "".join(s for _, s in rsegs)
    # in reference layout, the query content should appear in ref order:
    # A-part ... B-part ... C-part (C re-oriented to match the reference)
    apos = layout.find(A[100:200])
    bpos = layout.find(B[100:200])
    cpos = layout.find(C[100:200])
    assert apos != -1 and bpos != -1 and cpos != -1
    assert apos < bpos < cpos

    with open(bed) as f:
        lines = [l for l in f if not l.startswith("#")]
    assert len(lines) >= 3
    assert any("\t-\t" in l for l in lines)  # the inversion is flagged
