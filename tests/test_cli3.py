"""Third end-to-end CLI batch: rem input/caching variants (gz, multi-
contig, --sa/--lcp/--cache, --gml), variants output formats and type
filters, refine --simple/--complex, and the matplotlib plot commands."""

import gzip
import os

import numpy as np
import pytest

from reveal_tpu.cli import main
from reveal_tpu.core.io_fasta import fasta_writer


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli3")
    rng = np.random.default_rng(777)
    base = "".join(rng.choice(list("ACGT"), size=4000))

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
    for name in ("ga", "gb"):
        seqs[name] = mutate(base, 30, 8)
        fasta_writer(str(d / ("%s.fa" % name)), [(name, seqs[name])])
    run(["rem", d / "ga.fa", d / "gb.fa", "-o", d / "ab.gfa",
         "--backend", "np"])
    return d, seqs


def run(args):
    rc = main([str(a) for a in args])
    assert rc == 0 or rc is None


def _extract(path, sample, capsys):
    run(["extract", path, sample])
    capt = capsys.readouterr().out
    return "".join(capt.split("\n")[1:]).strip()


def test_rem_gzip_input(data, capsys):
    d, seqs = data
    gz = str(d / "ga.fa.gz")
    with gzip.open(gz, "wt") as f:
        f.write(">ga_z\n%s\n" % seqs["ga"])
    out = str(d / "zb.gfa")
    run(["rem", gz, d / "gb.fa", "-o", out, "--backend", "np"])
    assert _extract(out, "ga_z", capsys) == seqs["ga"]


def test_rem_multicontig(data, capsys):
    d, seqs = data
    rng = np.random.default_rng(9)
    c1 = seqs["ga"][:2000]
    c2 = "".join(rng.choice(list("ACGT"), size=1500))
    fasta_writer(str(d / "mc1.fa"), [("m1c1", c1), ("m1c2", c2)])
    fasta_writer(str(d / "mc2.fa"), [("m2c1", c1), ("m2c2", c2)])
    out = str(d / "mc.gfa")
    run(["rem", d / "mc1.fa", d / "mc2.fa", "-o", out, "--backend", "np"])
    # every contig is its own path, round-trips exactly
    for name, s in (("m1c1", c1), ("m1c2", c2), ("m2c1", c1),
                    ("m2c2", c2)):
        assert _extract(out, name, capsys) == s


def test_rem_cache_then_reuse(data, monkeypatch, tmp_path):
    d, seqs = data
    monkeypatch.chdir(tmp_path)  # .reveal.* cache files land in CWD
    run(["rem", d / "ga.fa", d / "gb.fa", "-o", "c1.gfa", "--cache",
         "--backend", "np"])
    for f in (".reveal.t", ".reveal.sa", ".reveal.lcp"):
        assert os.path.exists(f), f
    run(["rem", d / "ga.fa", d / "gb.fa", "-o", "c2.gfa",
         "--sa", ".reveal.sa", "--lcp", ".reveal.lcp",
         "--backend", "np"])
    assert open("c1.gfa").read() == open("c2.gfa").read()


def test_rem_sa_size_mismatch_is_error(data, monkeypatch, tmp_path):
    d, seqs = data
    monkeypatch.chdir(tmp_path)
    np.arange(10, dtype=np.int64).tofile("bad.sa")
    np.arange(10, dtype=np.int64).tofile("bad.lcp")
    with pytest.raises(ValueError, match="mismatch"):
        main(["rem", str(d / "ga.fa"), str(d / "gb.fa"), "-o", "x.gfa",
              "--sa", "bad.sa", "--lcp", "bad.lcp", "--backend", "np"])


def test_rem_gml_output(data, monkeypatch, tmp_path):
    d, seqs = data
    monkeypatch.chdir(tmp_path)
    run(["rem", d / "ga.fa", d / "gb.fa", "-o", "g.gfa", "--gml",
         "--backend", "np"])
    assert os.path.exists("g.gml")
    assert "graph [" in open("g.gml").read()


def test_variants_formats_and_type_filter(data, capsys):
    d, seqs = data
    graph = str(d / "ab.gfa")

    run(["variants", graph, "--bed"])
    bed = capsys.readouterr().out.strip().split("\n")
    assert bed and all(len(l.split("\t")) == 4 for l in bed)

    run(["variants", graph, "--fastaout"])
    fa = capsys.readouterr().out
    assert fa.startswith(">")

    run(["variants", graph, "--vcf", "--type", "snp"])
    vcf = capsys.readouterr().out
    recs = [l for l in vcf.split("\n") if l and not l.startswith("#")]
    assert recs
    for r in recs:  # SNP filter: 1bp ref, all alts 1bp
        cols = r.split("\t")
        assert len(cols[3]) == 1
        assert all(len(a) == 1 for a in cols[4].split(","))

    run(["variants", graph, "--vcf", "--type", "indel"])
    vcf2 = capsys.readouterr().out
    recs2 = [l for l in vcf2.split("\n") if l and not l.startswith("#")]
    # indels are anchor-base-prepended: ref/alt lengths differ
    for r in recs2:
        cols = r.split("\t")
        assert any(len(a) != len(cols[3]) for a in cols[4].split(","))


def test_refine_simple_and_complex(data, tmp_path):
    d, seqs = data
    graph = str(d / "ab.gfa")
    for flag in ("--simple", "--complex"):
        out = str(tmp_path / ("r%s.gfa" % flag.strip("-")))
        run(["refine", graph, flag, "-o", out, "--backend", "np"])
        assert os.path.exists(out)


def test_plot_png(data, tmp_path):
    d, seqs = data
    out = str(tmp_path / "dot.png")
    run(["plot", d / "ga.fa", d / "gb.fa", "-m", "20", "-o", out,
         "--backend", "np"])
    assert os.path.getsize(out) > 1000


def test_gplot_png(data, tmp_path):
    d, seqs = data
    out = str(tmp_path / "gdot.png")
    run(["gplot", d / "ab.gfa", "-x", "ga", "-y", "gb", "-o", out])
    assert os.path.getsize(out) > 1000


def test_variants_split_files(data, monkeypatch, tmp_path, capsys):
    d, seqs = data
    monkeypatch.chdir(tmp_path)
    run(["variants", str(d / "ab.gfa"), "--fastaout", "--split"])
    capsys.readouterr()
    files = [f for f in os.listdir(".") if f.endswith(".fasta")]
    assert files, "no per-variant fasta files written"
    txt = open(files[0]).read()
    assert txt.startswith(">")
    # file name is <source>_<sink>.fasta of a bubble
    stem = files[0][: -len(".fasta")]
    assert "_" in stem


def test_bubbles_export_complex(data, monkeypatch, tmp_path, capsys):
    d, seqs = data
    import shutil

    monkeypatch.chdir(tmp_path)
    shutil.copy(str(d / "ab.gfa"), "ab.gfa")
    run(["bubbles", "ab.gfa", "-e"])
    table = capsys.readouterr().out
    ncomplex = sum(
        1 for l in table.split("\n") if l.endswith("\tcomplex")
    )
    if ncomplex:
        assert os.path.exists("ab.complex.gfa")
        assert any(
            l.startswith("S\t") for l in open("ab.complex.gfa")
        )
    else:
        assert not os.path.exists("ab.complex.gfa")


def test_annotate_maxdiff_skips(tmp_path, capsys):
    vcf = (
        "##fileformat=VCFv4.1\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\t.\tA\tAACACACACA\t.\t.\t.\n"
    )
    f = tmp_path / "x.vcf"
    f.write_text(vcf)
    run(["annotate", str(f), "--maxdiff", "5"])
    out = capsys.readouterr().out
    # 9bp insertion >= maxdiff 5: record passes through unannotated
    assert "reveal_type=" not in out.split("\n")[-2]


def test_refine_method_reveal_rem(data, tmp_path, capsys):
    d, seqs = data
    out = str(tmp_path / "rrem.gfa")
    run(["refine", str(d / "ab.gfa"), "--all", "--method", "reveal_rem",
         "-o", out, "--backend", "np"])
    assert os.path.exists(out)
    # content is preserved through the rem-based bubble realignment
    assert _extract(out, "ga", capsys) == seqs["ga"]
    assert _extract(out, "gb", capsys) == seqs["gb"]


def test_refine_method_external_missing_tool(data, tmp_path, capsys):
    d, seqs = data
    out = str(tmp_path / "rmu.gfa")
    # muscle is not installed: bubbles fail gracefully, graph still
    # written with content intact
    run(["refine", str(d / "ab.gfa"), "--all", "--method", "muscle",
         "-o", out, "--backend", "np"])
    assert os.path.exists(out)
    assert _extract(out, "ga", capsys) == seqs["ga"]


def test_plot_region_zoom(data, monkeypatch, tmp_path):
    d, seqs = data
    monkeypatch.chdir(tmp_path)
    run(["plot", str(d / "ga.fa"), str(d / "gb.fa"), "-m", "20",
         "-r", "100-600", "--yr", "100-600", "--flanksize", "50",
         "--backend", "np"])
    files = [f for f in os.listdir(".") if f.endswith(".png")]
    assert files and "100-600" in files[0]
    assert os.path.getsize(files[0]) > 1000


def test_gplot_region(data, tmp_path):
    d, seqs = data
    out = str(tmp_path / "gr.png")
    run(["gplot", str(d / "ab.gfa"), "-x", "ga", "-y", "gb",
         "-r", "500:1500", "-o", out])
    assert os.path.getsize(out) > 1000
