"""Tests for the auxiliary converters (utils/dformat, utils/falcon2gfa)."""

import os

import numpy as np
import pytest

from reveal_tpu.core.io_fasta import fasta_reader, fasta_writer


def test_dformat_naming(tmp_path, capsys):
    from reveal_tpu.utils.dformat import main

    fasta_writer(
        str(tmp_path / "reads.v1.fa"),
        [("r1", "ACGT" * 60), ("r2", "TTTT" * 10)],
    )
    main([str(tmp_path / "reads.v1.fa")])
    out = capsys.readouterr().out
    lines = out.strip().split("\n")
    # daligner naming >template/well/start_end/length
    assert lines[0] == ">readsv1/0/0_240/240"
    # 100-column wrapping
    assert len(lines[1]) == 100
    assert ">readsv1/1/0_40/40" in out


def test_falcon2gfa_unaligned(tmp_path, monkeypatch, capsys):
    from reveal_tpu.utils.falcon2gfa import main

    rng = np.random.default_rng(8)
    p = "".join(rng.choice(list("ACGT"), size=800))
    alt = list(p[200:500])
    for _ in range(10):
        alt[int(rng.integers(0, len(alt)))] = "ACGT"[
            int(rng.integers(0, 4))
        ]
    monkeypatch.chdir(tmp_path)
    fasta_writer("p_ctg.fa", [("000000F", p)])
    fasta_writer("a_ctg_base.fa", [("000000F-01", p[200:500])])
    fasta_writer(
        "a_ctg_all.fa",
        [("000000F-01", p[200:500]), ("000000F-01-02", "".join(alt))],
    )
    main(["p_ctg.fa", "a_ctg_base.fa", "a_ctg_all.fa", "-o", "f.gfa"])
    assert os.path.exists("f.gfa")
    txt = open("f.gfa").read()
    assert any(l.startswith("S\t") for l in txt.split("\n"))
    names = [l.split("\t")[1] for l in txt.split("\n")
             if l.startswith("P\t")]
    assert "000000F" in names


def test_falcon2gfa_aligned_roundtrip(tmp_path, monkeypatch, capsys):
    from reveal_tpu.cli import main as cli_main
    from reveal_tpu.utils.falcon2gfa import main

    rng = np.random.default_rng(9)
    p = "".join(rng.choice(list("ACGT"), size=900))
    alt = list(p[300:600])
    for _ in range(8):
        alt[int(rng.integers(0, len(alt)))] = "ACGT"[
            int(rng.integers(0, 4))
        ]
    monkeypatch.chdir(tmp_path)
    fasta_writer("p_ctg.fa", [("000000F", p)])
    fasta_writer("a_ctg_base.fa", [("000000F-01", p[300:600])])
    fasta_writer(
        "a_ctg_all.fa",
        [("000000F-01", p[300:600]), ("000000F-01-02", "".join(alt))],
    )
    main(["p_ctg.fa", "a_ctg_base.fa", "a_ctg_all.fa", "--align",
          "-o", "fa.gfa"])
    assert os.path.exists("fa.gfa")
    cli_main(["extract", "fa.gfa", "000000F"])
    got = "".join(capsys.readouterr().out.split("\n")[1:]).strip()
    assert got == p
