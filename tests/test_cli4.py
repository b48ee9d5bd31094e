"""Fourth CLI batch: the transform/finish assembly commands driven
end-to-end through main(), plus rearrangements on a real breakpoint
graph."""

import gzip
import os

import numpy as np
import pytest

from reveal_tpu.cli import main
from reveal_tpu.core.encoding import rc_str
from reveal_tpu.core.io_fasta import fasta_reader, fasta_writer


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli4")
    rng = np.random.default_rng(11)
    A = "".join(rng.choice(list("ACGT"), size=4000))
    B = "".join(rng.choice(list("ACGT"), size=4000))
    C = "".join(rng.choice(list("ACGT"), size=4000))
    ref = A + B + C
    qry = B + A + rc_str(C)  # translocation + inversion
    fasta_writer(str(d / "ref.fa"), [("chr1", ref)])
    fasta_writer(str(d / "qry.fa"), [("ctg1", qry)])
    # split-contig draft for finish: two contigs out of ref order, one rc
    fasta_writer(
        str(d / "draft.fa"),
        [("c1", rc_str(B[:3500])), ("c2", A[:3500])],
    )
    return d, (A, B, C, ref, qry)


def run(args):
    rc = main([str(a) for a in args])
    assert rc == 0 or rc is None


def test_transform_cli(data, monkeypatch, tmp_path):
    d, (A, B, C, ref, qry) = data
    monkeypatch.chdir(tmp_path)
    run(["transform", d / "ref.fa", d / "qry.fa", "-m", "30",
         "-c", "100", "--mincluster", "30", "--minchainsum", "30",
         "--backend", "np", "-o", "tout"])
    assert os.path.exists("tout.gfa.gz")
    assert os.path.exists("tout.bed")
    bed = open("tout.bed").read().strip().split("\n")
    # breakpoints were detected: at least the A|B and B|C junctions
    assert len(bed) >= 1
    with gzip.open("tout.gfa.gz", "rt") as f:
        plines = [l for l in f if l.startswith("P")]
    assert any(l.split("\t")[1].startswith("*") for l in plines)


def test_rearrangements_on_breakpoint_graph(data, monkeypatch, tmp_path,
                                            capsys):
    d, _ = data
    monkeypatch.chdir(tmp_path)
    run(["transform", d / "ref.fa", d / "qry.fa", "-m", "30",
         "-c", "100", "--mincluster", "30", "--minchainsum", "30",
         "--backend", "np", "-o", "rout"])
    run(["rearrangements", "rout.gfa.gz"])
    capt = capsys.readouterr().out.strip().split("\n")
    # the '*' original-layout path traverses structural edges the
    # reference-layout path doesn't -> reported lines
    assert capt[0].startswith("#reference")
    assert len(capt) > 1
    for line in capt[1:]:
        cols = line.split("\t")
        assert len(cols) == 7
        assert "*ctg1" in cols[6]


def test_finish_cli(data, monkeypatch, tmp_path):
    d, (A, B, C, ref, qry) = data
    monkeypatch.chdir(tmp_path)
    run(["finish", d / "ref.fa", d / "draft.fa", "-m", "30",
         "--mincluster", "30", "--minchainsum", "30",
         "--backend", "np", "-o", "fin"])
    outs = [f for f in os.listdir(".") if f.startswith("fin")]
    assert outs, "no finish output written"
    fa = [f for f in outs if f.endswith((".fasta", ".fa"))]
    assert fa
    recs = dict(fasta_reader(fa[0]))
    pseudo = "".join(recs.values()).upper()
    # both contigs placed: A-prefix before B-prefix, B rc-corrected
    ai = pseudo.find(A[:3500])
    bi = pseudo.find(B[:3500])
    assert ai != -1 and bi != -1 and ai < bi


def test_finish_split_files(data, monkeypatch, tmp_path):
    d, (A, B, C, ref, qry) = data
    monkeypatch.chdir(tmp_path)
    run(["finish", d / "ref.fa", d / "draft.fa", "-m", "30",
         "--mincluster", "30", "--minchainsum", "30", "--split",
         "--backend", "np", "-o", "fs"])
    per_chrom = [f for f in os.listdir(".")
                 if f.startswith("fs_") and f.endswith(".fasta")]
    assert per_chrom, "no per-chromosome files written"
    recs = dict(fasta_reader(per_chrom[0]))
    assert recs and all(recs.values())


def test_plot_bed(data, monkeypatch, tmp_path):
    d, _ = data
    monkeypatch.chdir(tmp_path)
    run(["transform", d / "ref.fa", d / "qry.fa", "-m", "30",
         "-c", "100", "--mincluster", "30", "--minchainsum", "30",
         "--backend", "np", "-o", "bp2"])
    run(["plot", "bp2.bed"])
    assert os.path.getsize("bp2.bed.png") > 1000


def test_profile_flag_writes_xplane(data, monkeypatch, tmp_path):
    d, _ = data
    monkeypatch.chdir(tmp_path)
    run(["rem", d / "ref.fa", d / "qry.fa", "-m", "30", "--backend",
         "np", "--profile", "prof", "-o", "pp.gfa"])
    assert os.path.exists("pp.gfa")
    hits = []
    for root, _dirs, files in os.walk("prof"):
        hits += [f for f in files if f.endswith(".xplane.pb")]
    assert hits, "no xplane trace written by --profile"
