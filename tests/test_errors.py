"""Error-path behavior: malformed inputs fail loudly and cleanly."""

import numpy as np
import pytest

from reveal_tpu.cli import main
from reveal_tpu.core.io_fasta import fasta_writer
from reveal_tpu.core.io_gfa import read_gfa


def test_rem_single_input_errors(tmp_path):
    fasta_writer(str(tmp_path / "a.fa"), [("a", "ACGTACGTACGT")])
    with pytest.raises(ValueError, match="at least 2"):
        main(["rem", str(tmp_path / "a.fa"), "-o",
              str(tmp_path / "x.gfa"), "--backend", "np"])


def test_read_gfa_no_paths(tmp_path):
    f = tmp_path / "nopath.gfa"
    f.write_text("H\tVN:Z:1.0\nS\t1\tACGT\n")
    with pytest.raises(ValueError, match="No paths"):
        read_gfa(str(f))


def test_read_gfa_bad_path_edge(tmp_path):
    f = tmp_path / "bad.gfa"
    f.write_text(
        "H\tVN:Z:1.0\nS\t1\tACGT\nS\t2\tTTTT\nP\tx\t1+,2+\t0M\n"
    )
    with pytest.raises(ValueError, match="no such edge"):
        read_gfa(str(f))


def test_extract_unknown_path(tmp_path):
    f = tmp_path / "g.gfa"
    f.write_text(
        "H\tVN:Z:1.0\nS\t1\tACGT\nP\tx\t1+\t0M\n"
    )
    with pytest.raises(KeyError, match="Unknown path"):
        main(["extract", str(f), "nope"])


def test_variants_no_bubbles(tmp_path, capsys):
    fasta_writer(str(tmp_path / "a.fa"), [("a", "ACGT" * 200)])
    fasta_writer(str(tmp_path / "b.fa"), [("b", "ACGT" * 200)])
    out = str(tmp_path / "identical.gfa")
    rc = main(["rem", str(tmp_path / "a.fa"), str(tmp_path / "b.fa"),
               "-o", out, "--backend", "np"])
    assert rc == 0 or rc is None
    capsys.readouterr()
    rc = main(["variants", out, "--vcf"])
    assert rc == 0 or rc is None
    vcf = capsys.readouterr().out
    recs = [l for l in vcf.split("\n") if l and not l.startswith("#")]
    assert recs == []  # identical genomes: headers only


def test_unzip_noop_without_bubbles(tmp_path):
    fasta_writer(str(tmp_path / "a.fa"), [("a", "ACGT" * 200)])
    fasta_writer(str(tmp_path / "b.fa"), [("b", "ACGT" * 200)])
    out = str(tmp_path / "i.gfa")
    main(["rem", str(tmp_path / "a.fa"), str(tmp_path / "b.fa"),
          "-o", out, "--backend", "np"])
    before = open(out).read()
    # unzip appends .gfa to an explicit -o prefix
    main(["unzip", out, "-u10", "-o", str(tmp_path / "i.unzipped")])
    after = open(str(tmp_path / "i.unzipped.gfa")).read()
    # no bubbles: node content unchanged (headers may differ)
    s_before = sorted(l for l in before.split("\n") if l.startswith("S"))
    s_after = sorted(l for l in after.split("\n") if l.startswith("S"))
    assert s_before == s_after


def test_merge_duplicate_paths_errors(tmp_path):
    f1 = tmp_path / "g1.gfa"
    f1.write_text("H\tVN:Z:1.0\nS\t1\tACGT\nP\tx\t1+\t0M\n")
    f2 = tmp_path / "g2.gfa"
    f2.write_text("H\tVN:Z:1.0\nS\t1\tTTTT\nP\tx\t1+\t0M\n")
    with pytest.raises(ValueError, match="already contains path"):
        main(["merge", str(f1), str(f2), "-o",
              str(tmp_path / "m.gfa")])
