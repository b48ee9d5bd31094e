"""Second end-to-end CLI batch: the subcommands not exercised by
test_cli.py (merge, comp, subgraph, matches, align script emission,
chain, annotate, rearrangements, convert gml/maf)."""

import os

import numpy as np
import pytest

from reveal_tpu.cli import main
from reveal_tpu.core.encoding import rc_str
from reveal_tpu.core.io_fasta import fasta_writer


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli2")
    rng = np.random.default_rng(321)
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
    for name in ("ga", "gb", "gc", "gd"):
        seqs[name] = mutate(base, 30, 8)
        fasta_writer(str(d / ("%s.fa" % name)), [(name, seqs[name])])
    run(["rem", d / "ga.fa", d / "gb.fa", "-o", d / "ab.gfa",
         "--backend", "np"])
    run(["rem", d / "gc.fa", d / "gd.fa", "-o", d / "cd.gfa",
         "--backend", "np"])
    return d, seqs


def run(args):
    rc = main([str(a) for a in args])
    assert rc == 0 or rc is None


def _extract(path, sample, capsys):
    run(["extract", path, sample])
    capt = capsys.readouterr().out
    return "".join(capt.split("\n")[1:]).strip()


def test_merge(data, capsys):
    d, seqs = data
    out = str(d / "merged.gfa")
    # duplicate path names are a hard error in the reference too
    # (utils.py:503-510), so merge graphs with disjoint sample sets
    run(["merge", d / "ab.gfa", d / "cd.gfa", "-o", out])
    assert os.path.exists(out)
    txt = open(out).read()
    # all four paths survive the merge with remapped node ids
    assert sum(l.startswith("P\t") for l in txt.split("\n")) == 4
    for name in ("ga", "gb", "gc", "gd"):
        assert _extract(out, name, capsys) == seqs[name]


def test_comp_double_is_identity(data, capsys):
    d, seqs = data
    rc1 = str(d / "rc1.gfa")
    rc2 = str(d / "rc2.gfa")
    run(["comp", d / "ab.gfa", "-o", rc1])
    run(["comp", rc1, "-o", rc2])
    orig = _extract(str(d / "ab.gfa"), "ga", capsys)
    once = _extract(rc1, "ga", capsys)
    twice = _extract(rc2, "ga", capsys)
    assert orig == seqs["ga"]
    assert once == rc_str(seqs["ga"])
    assert twice == seqs["ga"]


def test_subgraph(data):
    d, seqs = data
    nodes = []
    for line in open(str(d / "ab.gfa")):
        if line.startswith("S"):
            nodes.append(line.split("\t")[1])
    assert len(nodes) >= 3
    out = str(d / "sg.gfa")
    run(["subgraph", str(d / "ab.gfa")] + nodes[:3] + ["-o", out])
    assert os.path.exists(out)
    got = [l.split("\t")[1] for l in open(out) if l.startswith("S")]
    assert set(got) <= set(nodes[:3]) and got


def test_matches(data, capsys):
    d, seqs = data
    run(["matches", d / "ga.fa", d / "gb.fa", "-m", "20",
         "--backend", "np"])
    capt = capsys.readouterr().out
    lines = capt.strip().split("\n")
    assert lines[0].startswith("#length")
    assert len(lines) > 1
    la, pa, pb, isrc = (int(x) for x in lines[1].split("\t"))
    assert la >= 20 and isrc == 0
    # the reported coordinates really are a shared 20+bp exact match
    assert seqs["ga"][pa : pa + la] == seqs["gb"][pb : pb + la]


def test_matches_rc(data, capsys):
    d, seqs = data
    # reverse complement gb so all long matches are rc matches
    fasta_writer(str(d / "gb_rc.fa"), [("gb_rc", rc_str(seqs["gb"]))])
    run(["matches", d / "ga.fa", d / "gb_rc.fa", "-m", "100", "--rc",
         "--backend", "np"])
    capt = capsys.readouterr().out
    lines = capt.strip().split("\n")[1:]
    assert lines and all(l.split("\t")[3] == "1" for l in lines)


def test_align_script_sequential(data, capsys):
    d, seqs = data
    run(["align", d / "ga.fa", d / "gb.fa", d / "gc.fa",
         "--order", "sequential", "--chunksize", "2", "-o", "prg"])
    capt = capsys.readouterr().out
    assert "rem" in capt and "unzip prg.gfa" in capt
    assert "refine" in capt and "variants" in capt
    # hierarchical: 2-chunk level produces a tmp graph + cleanup
    assert "rm " in capt
    # every non-comment line is a runnable pipeline command
    for line in capt.strip().split("\n"):
        assert line.startswith("#") or line.startswith(
            ("python -m reveal_tpu.cli", "rm ")
        ), line


def test_align_script_parallel(data, capsys, tmp_path, monkeypatch):
    """--parallel backgrounds each level's independent chunk jobs with a
    wait barrier, and the executed script produces the same graph as
    the serial emission."""
    import subprocess
    import sys as _sys

    d, seqs = data
    gd = list(seqs["ga"])
    rngl = np.random.default_rng(4)
    for _ in range(10):
        gd[int(rngl.integers(0, len(gd)))] = "ACGT"[
            int(rngl.integers(0, 4))
        ]
    fasta_writer(str(d / "gd.fa"), [("gd", "".join(gd))])
    scripts = {}
    for flag in ([], ["--parallel"]):
        run(["align", d / "ga.fa", d / "gb.fa", d / "gc.fa", d / "gd.fa",
             "--order", "sequential", "--chunksize", "2", "-o", "prg",
             "--norefine", "--nounzip", "--novariants"] + flag)
        scripts[bool(flag)] = capsys.readouterr().out
    assert " &" not in scripts[False] and "wait" not in scripts[False]
    par = scripts[True]
    assert par.count(" &") == 2 and par.count("\nwait\n") == 1
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    outs = {}
    for key, script in scripts.items():
        wd = tmp_path / ("par" if key else "ser")
        wd.mkdir()
        (wd / "run.sh").write_text(script.replace(
            "python -m", "%s -m" % _sys.executable))
        r = subprocess.run(
            ["bash", "run.sh"], cwd=wd, env=env,
            capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-1000:]
        outs[key] = (wd / "prg.gfa").read_bytes()
    assert outs[True] == outs[False]


def test_align_script_checkpoints(data, capsys, tmp_path):
    """--checkpoints gives every rem job and the refine stage a
    --checkpoint file, defers cleanup to the script end, and a partial
    run (one chunk job done) resumes through the same script to the
    same graph as a checkpoint-free run."""
    import subprocess
    import sys as _sys

    d, seqs = data
    base = ["align", d / "ga.fa", d / "gb.fa", d / "gc.fa",
            "--order", "sequential", "--chunksize", "2", "-o", "prg",
            "--norefine", "--nounzip", "--novariants"]
    run(base)
    plain = capsys.readouterr().out
    assert "--checkpoint" not in plain
    run(base + ["--checkpoints"])
    ck = capsys.readouterr().out
    rems = [ln for ln in ck.splitlines() if " rem " in ln]
    assert rems and all("--checkpoint" in ln for ln in rems)
    # cleanup (incl. .anchors) is the LAST step of the script
    lines = [ln for ln in ck.splitlines() if ln and not ln.startswith("#")]
    assert lines[-1].startswith("rm -f")
    assert any(".anchors" in ln for ln in lines)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    script = ck.replace("python -m", "%s -m" % _sys.executable)
    wd = tmp_path / "ckrun"
    wd.mkdir()
    (wd / "run.sh").write_text(script)
    # simulate a preempted run: execute only the first rem chunk job
    first_rem = next(
        ln for ln in script.splitlines() if " rem " in ln
    ).rstrip("& ")
    r = subprocess.run(
        ["bash", "-c", first_rem], cwd=wd, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert list(wd.glob("*.anchors")), "chunk checkpoint missing"
    # now the full script: the finished chunk replays from its log
    r = subprocess.run(
        ["bash", "run.sh"], cwd=wd, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert not list(wd.glob("*.anchors")), "cleanup left checkpoints"

    wd2 = tmp_path / "plainrun"
    wd2.mkdir()
    (wd2 / "run.sh").write_text(
        plain.replace("python -m", "%s -m" % _sys.executable)
    )
    r = subprocess.run(
        ["bash", "run.sh"], cwd=wd2, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert (wd / "prg.gfa").read_bytes() == (wd2 / "prg.gfa").read_bytes()


def test_align_script_simultaneous(data, capsys):
    d, seqs = data
    run(["align", d / "ga.fa", d / "gb.fa", "--order", "simultaneous",
         "--norefine", "--nounzip", "-o", "out"])
    capt = capsys.readouterr().out
    assert "rem %s %s" % (d / "ga.fa", d / "gb.fa") in capt
    assert "refine" not in capt and "unzip" not in capt


def test_chain_roundtrip(data, capsys):
    d, seqs = data
    out = str(d / "chained")
    run(["chain", d / "ga.fa", d / "gb.fa", "-m", "20", "-o", out,
         "--backend", "np"])
    assert os.path.exists(out + ".gfa")
    # chain names paths by filename (kdchain sample = basename, as the
    # reference does)
    assert _extract(out + ".gfa", "ga.fa", capsys) == seqs["ga"]
    assert _extract(out + ".gfa", "gb.fa", capsys) == seqs["gb"]


def test_annotate(data, capsys, tmp_path):
    d, seqs = data
    run(["variants", d / "ab.gfa", "--vcf"])
    vcf = capsys.readouterr().out
    assert vcf.count("\n") > 5
    vcff = tmp_path / "ab.vcf"
    vcff.write_text(vcf)
    run(["annotate", str(vcff)])
    ann = capsys.readouterr().out
    assert "##INFO=<ID=reveal_type" in ann
    recs = [l for l in ann.split("\n") if l and not l.startswith("#")]
    assert recs and all("reveal_type=" in r for r in recs)


def test_rearrangements(data, capsys):
    d, seqs = data
    run(["rearrangements", d / "ab.gfa"])
    capt = capsys.readouterr().out
    # plain rem graph: header, no structural edges
    assert capt.startswith("#reference\t")


def test_convert_gml_and_maf(data):
    d, seqs = data
    run(["convert", d / "ab.gfa", "--type", "gml"])
    assert os.path.exists(str(d / "ab.gml"))
    run(["convert", d / "ab.gfa", "--type", "maf"])
    maf = str(d / "ab.maf")
    assert os.path.exists(maf)
    txt = open(maf).read()
    assert txt.startswith("##maf") and "\ns ga" in txt and "\ns gb" in txt


def test_extract_all_and_node_walk(data, capsys):
    d, seqs = data
    run(["extract", d / "ab.gfa", "--all"])
    capt = capsys.readouterr().out
    # every path comes back as a fasta record with its exact sequence
    recs = {}
    cur = None
    for line in capt.strip().split("\n"):
        if line.startswith(">"):
            cur = line[1:]
            recs[cur] = []
        else:
            recs[cur].append(line)
    assert set(recs) == {"ga", "gb"}
    for name in recs:
        assert "".join(recs[name]) == seqs[name]

    # -t path: explicit node walk with an rc step
    from reveal_tpu.core.encoding import rc_str
    from reveal_tpu.core.io_gfa import read_gfa

    G = read_gfa(str(d / "ab.gfa"))
    nid = next(n for n in G.nodes if not isinstance(n, str)
               and G.nodes[n].get("seq"))
    nseq = G.nodes[nid]["seq"]
    run(["extract", d / "ab.gfa", "-t", "path", "%d+,%d-" % (nid, nid)])
    capt = capsys.readouterr().out
    got = "".join(capt.strip().split("\n")[1:])
    assert got == nseq + rc_str(nseq)

def test_align_run_inproc_matches_script(data, capsys, tmp_path, monkeypatch):
    """align --run executes the same pipeline in-process: identical
    output files to running the emitted script, no script printed."""
    import subprocess
    import sys as _sys

    d, seqs = data
    args = [d / "ga.fa", d / "gb.fa", d / "gc.fa",
            "--order", "sequential", "--chunksize", "2", "-o", "prg"]

    # script route (subprocess, like a user piping to sh)
    run(["align"] + args)
    script = capsys.readouterr().out
    wd1 = tmp_path / "script"
    wd1.mkdir()
    (wd1 / "run.sh").write_text(
        script.replace("python -m", "%s -m" % _sys.executable)
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    r = subprocess.run(
        ["bash", "run.sh"], cwd=wd1, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-1000:]

    # in-process route
    wd2 = tmp_path / "inproc"
    wd2.mkdir()
    monkeypatch.chdir(wd2)
    run(["align"] + args + ["--run"])
    assert capsys.readouterr().out == ""  # no script printed

    produced = sorted(p.name for p in wd2.iterdir())
    assert produced == sorted(p.name for p in wd1.iterdir() if p.name != "run.sh")
    for name in produced:
        assert (wd2 / name).read_bytes() == (wd1 / name).read_bytes(), name
