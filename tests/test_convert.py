"""Convert subcommand tests (maf round-trips both directions)."""

import os

from reveal_tpu.cli import main
from reveal_tpu.core.io_gfa import read_gfa
from reveal_tpu.graph.extract import extract


def test_maf2graph_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    seqA = "TTTT" + "ACGTACGTAC" + "GGGG"
    seqB = "CC" + "ACGTTCGTAC" + "AAAAA"
    (tmp_path / "g1.fasta").write_text(">sA\n%s\n" % seqA)
    (tmp_path / "g2.fasta").write_text(">sB\n%s\n" % seqB)
    (tmp_path / "test.maf").write_text(
        "##maf version=1\n"
        "a\n"
        "s g1.sA 4 10 + %d ACGTACGTAC\n" % len(seqA)
        + "s g2.sB 2 10 + %d ACGTTCGTAC\n\n" % len(seqB)
    )
    main(["convert", "test.maf"])
    G = read_gfa("test.gfa")
    assert extract(G, "sA") == seqA
    assert extract(G, "sB") == seqB


def test_graph2maf_and_back(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "a.fa").write_text(">x\nACGTACGTACGTGGA\n")
    (tmp_path / "b.fa").write_text(">y\nACGTACCTACGTGGA\n")
    main(["rem", "a.fa", "b.fa", "-o", "ab.gfa", "-m", "4", "--backend", "np"])
    main(["convert", "ab.gfa", "--type", "maf"])
    assert os.path.exists("ab.maf")
    txt = open("ab.maf").read()
    assert txt.startswith("##maf")
    assert "x" in txt and "y" in txt


def test_fasta_to_gfa_plain_and_aligned(tmp_path, capsys, monkeypatch):
    """convert fasta->gfa: plain records become one node per sequence;
    --aligned treats the records as MSA rows and builds the column graph
    (convert.py:60-120)."""
    import os

    from reveal_tpu.cli import main
    from reveal_tpu.core.io_fasta import fasta_writer

    monkeypatch.chdir(tmp_path)
    fasta_writer("plain.fa", [("s1", "ACGTACGT"), ("s2", "ACGTTGCA")])
    main(["convert", "plain.fa"])
    assert os.path.exists("plain.gfa")
    txt = open("plain.gfa").read()
    assert txt.count("\nP\t") + txt.startswith("P\t") >= 1

    # aligned rows: shared columns collapse into shared nodes
    fasta_writer(
        "msa.fa",
        [("s1", "ACGT-ACGT"), ("s2", "ACGTTACGT")],
    )
    main(["convert", "msa.fa", "--aligned"])
    assert os.path.exists("msa.gfa")
    main(["extract", "msa.gfa", "s1"])
    got = "".join(capsys.readouterr().out.split("\n")[1:]).strip()
    assert got == "ACGTACGT"
    main(["extract", "msa.gfa", "s2"])
    got2 = "".join(capsys.readouterr().out.split("\n")[1:]).strip()
    assert got2 == "ACGTTACGT"
