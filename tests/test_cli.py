"""End-to-end CLI tests, mirroring the reference's suite style
(test_reveal.py: drive main() and check outputs)."""

import gzip
import os

import numpy as np
import pytest

from reveal_tpu.cli import main
from reveal_tpu.core.io_fasta import fasta_writer


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(123)
    base = "".join(rng.choice(list("ACGT"), size=5000))

    def mutate(seq, nsubs, nindel):
        s = list(seq)
        for _ in range(nsubs):
            i = int(rng.integers(0, len(s)))
            s[i] = "ACGT"[int(rng.integers(0, 4))]
        for _ in range(nindel):
            i = int(rng.integers(0, len(s)))
            if rng.random() < 0.5:
                s.insert(i, "ACGT"[int(rng.integers(0, 4))])
            else:
                del s[i]
        return "".join(s)

    seqs = {}
    for name in ("ga", "gb", "gc"):
        seqs[name] = mutate(base, 40, 12)
        fasta_writer(str(d / ("%s.fa" % name)), [(name, seqs[name])])
    return d, seqs


def run(args):
    rc = main([str(a) for a in args])
    assert rc == 0 or rc is None


def test01_rem_pair(data, capsys):
    d, seqs = data
    out = str(d / "ab.gfa")
    run(["rem", d / "ga.fa", d / "gb.fa", "-o", out, "--backend", "np"])
    assert os.path.exists(out)


def test02_rem_threeway(data):
    d, seqs = data
    out = str(d / "abc.gfa")
    run(
        ["rem", d / "ga.fa", d / "gb.fa", d / "gc.fa", "-o", out,
         "--backend", "np"]
    )
    assert os.path.exists(out)


def test03_extract_roundtrip(data, capsys):
    d, seqs = data
    run(["extract", d / "abc.gfa", "ga"])
    capt = capsys.readouterr().out
    got = "".join(capt.split("\n")[1:]).strip()
    assert got == seqs["ga"]


def test04_bubbles(data, capsys):
    d, seqs = data
    run(["bubbles", d / "abc.gfa"])
    capt = capsys.readouterr().out
    assert capt.startswith("#source")
    assert len(capt.splitlines()) > 2


def test05_variants_vcf(data, capsys):
    d, seqs = data
    run(["variants", d / "abc.gfa", "--vcf"])
    capt = capsys.readouterr().out
    assert "##fileformat=VCF" in capt
    rows = [l for l in capt.splitlines() if not l.startswith("#")]
    assert rows, "expected variant rows"
    # genotype columns for the three samples
    assert all(len(r.split("\t")) == 12 for r in rows)


def test06_unzip(data):
    d, seqs = data
    run(["unzip", d / "abc.gfa", "-u10"])
    assert os.path.exists(str(d / "abc.unzipped.gfa"))


def test07_refine(data):
    d, seqs = data
    run(
        ["refine", str(d / "abc.unzipped.gfa"), "--all",
         "--nrefinements", "3", "-o", str(d / "abc.realigned.gfa")]
    )
    assert os.path.exists(str(d / "abc.realigned.gfa"))


def test08_refined_roundtrip(data, capsys):
    d, seqs = data
    for name in ("ga", "gb", "gc"):
        run(["extract", str(d / "abc.realigned.gfa"), name])
        capt = capsys.readouterr().out
        got = "".join(capt.split("\n")[1:]).strip()
        assert got == seqs[name], "%s corrupted by unzip+refine" % name


def test09_stats(data, capsys):
    d, seqs = data
    run(["stats", d / "abc.gfa"])
    assert "Samples (3)" in capsys.readouterr().out


def test10_graph_x_graph(data):
    d, seqs = data
    out = str(d / "merged.gfa")
    run(["rem", d / "ab.gfa", d / "gc.fa", "-o", out, "--backend", "np"])
    assert os.path.exists(out)


def test11_split(data):
    d, seqs = data
    run(["split", d / "abc.gfa"])
    assert os.path.exists(str(d / "abc.0.gfa"))


def test12_chop(data):
    d, seqs = data
    run(["chop", d / "abc.gfa", "-k", "21", "--check"])
    assert os.path.exists(str(d / "abc.chopped.gfa.gz"))
