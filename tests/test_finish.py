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
    cfg = FinishConfig(minlength=20, mincluster=30, minchainsum=30, backend="np")
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
