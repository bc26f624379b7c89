"""paftools mapeval/stat subset (misc/paftools.js analog)."""

import io
import contextlib

from mm2_gb_tpu.tools import paftools


def _run(cmd, text):
    import tempfile, os
    fd, path = tempfile.mkstemp(suffix=".paf")
    with os.fdopen(fd, "w") as f:
        f.write(text)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = paftools.main([cmd, path])
    os.unlink(path)
    assert rc == 0
    return buf.getvalue()


PAF = """\
r0!chr1!100!900!+\t800\t0\t800\t+\tchr1\t10000\t100\t900\t790\t800\t60\ttp:A:P\tcm:i:50\ts1:i:700\ts2:i:0
r1!chr1!2000!2800!-\t800\t0\t800\t-\tchr1\t10000\t5000\t5800\t790\t800\t13\ttp:A:P\tcm:i:50\ts1:i:700\ts2:i:0
r2!chr1!3000!3700!+\t700\t0\t700\t+\tchr1\t10000\t3000\t3700\t690\t700\t60\ttp:A:P\tcm:i:40\ts1:i:600\ts2:i:0
"""


def test_mapeval_roc():
    out = _run("mapeval", PAF)
    lines = [l.split() for l in out.splitlines()]
    # ROC rows split at MAPQ levels with errors: Q60 clean (2 reads),
    # then the wrong-locus r1 at Q13 adds one error (cumulative 1/3)
    assert lines[0] == ["Q", "60", "2", "0", "0.000000000", "2"]
    assert lines[1] == ["Q", "13", "1", "1", "0.333333333", "3"]


def test_stat_counts():
    paf = ("q1\t1000\t0\t1000\t+\tchr1\t10000\t0\t1010\t980\t1010\t60\t"
           "NM:i:30\tnn:i:0\ttp:A:P\tcm:i:50\ts1:i:700\ts2:i:0\t"
           "cg:Z:500M10D490M10I\n")
    out = _run("stat", paf)
    assert "Number of mapped sequences: 1" in out
    assert "Number of substitutions: 10" in out
    assert "Number of insertions in [0,50): 1" in out
    assert "Number of deletions in [0,50): 1" in out


# ------------------------------------------------ conversion subcommands
def _mk_variant_pair(tmp_path):
    """Contig with one SNP (20000 A<->G), one 2bp deletion (30000), one
    3bp insertion (before 40000) against a 60kb reference."""
    import random
    rng = random.Random(3)
    ref = "".join(rng.choice("ACGT") for _ in range(60000))
    ctg = list(ref)
    ctg[20000] = {"A": "G", "G": "A", "C": "T", "T": "C"}[ctg[20000]]
    del ctg[30000:30002]
    ctg[40000:40000] = list("TTT")
    ctg = "".join(ctg)
    rf = tmp_path / "ref.fa"
    cf = tmp_path / "ctg.fa"
    rf.write_text(">ref\n" + ref + "\n")
    cf.write_text(">ctg\n" + ctg + "\n")
    return str(rf), str(cf)


def _map(flags, target, query, capsys):
    from mm2_gb_tpu.cli import main as mm_main
    rc = mm_main(["--max-chain-skip=2147483647"] + flags + [target, query])
    assert rc == 0
    return capsys.readouterr().out


def test_call_text_and_vcf(tmp_path, capsys):
    rf, cf = _mk_variant_pair(tmp_path)
    paf = tmp_path / "a.paf"
    paf.write_text(_map(["-c", "--cs"], rf, cf, capsys))
    rc = paftools.main(["call", str(paf)])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert "R\tref\t0\t60000" in out
    vs = [l.split("\t") for l in out if l.startswith("V")]
    assert [v[2] for v in vs] == ["20000", "30000", "40001"]
    assert vs[0][6:8] == ["a", "g"]          # SNP
    assert vs[1][6:8] == ["aa", "-"]         # 2bp deletion
    assert vs[2][6:8] == ["-", "ttt"]        # 3bp insertion
    rc = paftools.main(["call", "-f", rf, str(paf)])
    assert rc == 0
    vcf = [l.split("\t") for l in capsys.readouterr().out.splitlines()
           if l and not l.startswith("#")]
    assert [(v[1], v[3], v[4]) for v in vcf] == [
        ("20001", "A", "G"), ("30000", "CAA", "C"), ("40001", "C", "CTTT")]


def test_liftover_shifts_through_indels(tmp_path, capsys):
    rf, cf = _mk_variant_pair(tmp_path)
    paf = tmp_path / "a.paf"
    paf.write_text(_map(["-c"], rf, cf, capsys))
    bed = tmp_path / "q.bed"
    bed.write_text("ctg\t19990\t20010\nctg\t29990\t30010\nctg\t39990\t40010\n")
    rc = paftools.main(["liftover", "-l", "1000", str(paf), str(bed)])
    assert rc == 0
    rows = [l.split("\t") for l in capsys.readouterr().out.splitlines()]
    # deletion widens the lifted span; prior indels shift later coords
    assert rows[0][:3] == ["ref", "19990", "20010"]
    assert rows[1][:3] == ["ref", "29990", "30012"]
    assert rows[2][:3] == ["ref", "39992", "40009"]


def test_sam2paf_roundtrip_matches_paf(tmp_path, capsys):
    rf, cf = _mk_variant_pair(tmp_path)
    sam = tmp_path / "a.sam"
    sam.write_text(_map(["-a", "--MD"], rf, cf, capsys))
    want = _map(["-c"], rf, cf, capsys).splitlines()
    rc = paftools.main(["sam2paf", str(sam)])
    assert rc == 0
    got = capsys.readouterr().out.splitlines()
    assert len(got) == len(want)
    for a, b in zip(got, want):
        fa, fb = a.split("\t"), b.split("\t")
        assert fa[:9] == fb[:9] and fa[10] == fb[10]
        cg_a = [f for f in fa if f.startswith("cg:Z:")]
        cg_b = [f for f in fb if f.startswith("cg:Z:")]
        assert cg_a == cg_b


def test_view_formats(tmp_path, capsys):
    rf, cf = _mk_variant_pair(tmp_path)
    paf = tmp_path / "a.paf"
    paf.write_text(_map(["-c", "--cs=long"], rf, cf, capsys))
    rc = paftools.main(["view", "-f", "maf", str(paf)])
    assert rc == 0
    ml = capsys.readouterr().out.splitlines()
    srows = [l for l in ml if l.startswith("s ")]
    assert len(srows) == 2
    assert len(srows[0].split()[-1]) == len(srows[1].split()[-1])
    rc = paftools.main(["view", "-f", "lastz-cigar", str(paf)])
    assert rc == 0
    lz = capsys.readouterr().out
    assert lz.startswith("cigar: ctg 0 60001 + ref 0 60000 +")
    rc = paftools.main(["view", "-l", "60", str(paf)])
    assert rc == 0
    aln = capsys.readouterr().out.splitlines()
    assert aln[0].startswith(">ctg")
    assert "mm:i:1" in aln[0] and "ei:i:3" in aln[0] and "ed:i:2" in aln[0]
    assert aln[1].startswith("Ref+:") and aln[3].startswith("Qry+:")
