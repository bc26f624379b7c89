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


def _run_cmd(fn, argv, capsys):
    rc = fn(argv)
    assert rc == 0 or rc is None
    return capsys.readouterr()


def test_junceval(tmp_path, capsys):
    """junceval counters + -p overlap listing (paftools.js:2346-2516)."""
    from mm2_gb_tpu.tools import paftools as P
    gtf = tmp_path / "g.gtf"
    gtf.write_text(
        'chr1\tx\texon\t101\t200\t.\t+\t.\ttranscript_id "t1";\n'
        'chr1\tx\texon\t301\t400\t.\t+\t.\ttranscript_id "t1";\n')
    sam = tmp_path / "a.sam"
    sam.write_text(
        "r1\t0\tchr1\t101\t60\t100M100N100M\t*\t0\t0\t*\t*\n"
        "r2\t0\tchr1\t101\t60\t100M90N100M\t*\t0\t0\t*\t*\n"
        "r3\t0\tchr1\t101\t60\t200M\t*\t0\t0\t*\t*\n")
    out = _run_cmd(P.junceval, [str(gtf), str(sam)], capsys).out
    assert "# mapped reads: 3" in out
    assert "# singletons: 1" in out
    assert "# predicted introns: 2" in out
    assert "# correct introns: 1 (50.00%)" in out
    out = _run_cmd(P.junceval, ["-p", str(gtf), str(sam)], capsys).out
    assert "C\tr1\t1\tchr1\t200\t300\t[(200,300)]" in out
    assert "P\tr2\t1\tchr1\t200\t290\t[(200,300)]" in out
    # -l fuzz tolerance accepts the off-by-10 junction
    out = _run_cmd(P.junceval, ["-l", "10", str(gtf), str(sam)],
                   capsys).out
    assert "# correct introns: 2 (100.00%)" in out


def test_bedcov(tmp_path, capsys):
    """bedcov coverage merge semantics (paftools.js:1141-1261)."""
    from mm2_gb_tpu.tools import paftools as P
    reg = tmp_path / "reg.bed"
    reg.write_text("chr1\t10\t50\nchr1\t40\t80\n")
    tgt = tmp_path / "tgt.bed"
    tgt.write_text("chr1\t0\t100\nchr1\t200\t300\n")
    cap = _run_cmd(P.bedcov, [str(reg), str(tgt)], capsys)
    assert "# target bases: 200" in cap.err
    assert "# target bases overlapping regions: 70 (35.00%)" in cap.err
    cap = _run_cmd(P.bedcov, ["-p", str(reg), str(tgt)], capsys)
    assert "F\tchr1\t0\t100\t100\t70" in cap.out


def test_vcfstat(tmp_path, capsys):
    from mm2_gb_tpu.tools import paftools as P
    vcf = tmp_path / "v.vcf"
    vcf.write_text("##x\n"
                   "chr1\t5\t.\tA\tG\t.\t.\t.\n"
                   "chr1\t9\t.\tAT\tA\t.\t.\t.\n"
                   "chr1\t12\t.\tC\tCAGG\t.\t.\t.\n"
                   "chr1\t20\t.\tA\tT,C\t.\t.\t.\n")
    out = _run_cmd(P.vcfstat, [str(vcf)], capsys).out
    assert "# substitutions: 3" in out
    assert "ts/tv: 0.500" in out
    assert "# insertions: 1" in out
    assert "# [3,50) insertions: 1" in out
    assert "# 1bp deletions: 1" in out


def test_pafcmp(tmp_path, capsys):
    from mm2_gb_tpu.tools import paftools as P
    base = tmp_path / "b.paf"
    base.write_text("q1\t10000\t0\t9000\t+\tc1\t50000\t100\t9100\t8000"
                    "\t9000\t60\ttp:A:P\n"
                    "q2\t10000\t0\t9000\t+\tc1\t50000\t20000\t29000"
                    "\t8000\t9000\t60\ttp:A:P\n")
    test = tmp_path / "t.paf"
    test.write_text("q1\t10000\t0\t9000\t+\tc1\t50000\t120\t9120\t8000"
                    "\t9000\t60\ttp:A:P\n"
                    "q2\t10000\t0\t9000\t+\tc2\t50000\t100\t9100\t8000"
                    "\t9000\t60\ttp:A:P\n")
    out = _run_cmd(P.pafcmp, [str(base), str(test)], capsys).out
    assert "X\t2 base alignments with mapQ>=10" in out
    assert "X\t1 base alignments correctly mapped by test" in out
    assert "X\t1 wrong test alignment" in out
    assert out.startswith("W\tq2\t")
    assert "X\t0 additional test alignments with mapQ>=10" in out


def test_misjoin(tmp_path, capsys):
    """misjoin event classes (paftools.js:2664-2804)."""
    from mm2_gb_tpu.tools import paftools as P

    def paf_line(q, qs, qe, strand, ctg, ts, te):
        return (f"{q}\t10000000\t{qs}\t{qe}\t{strand}\t{ctg}\t50000000"
                f"\t{ts}\t{te}\t{qe-qs}\t{qe-qs}\t60\n")

    paf = tmp_path / "a.paf"
    paf.write_text(
        # ctg A: two segments on different chromosomes -> J
        paf_line("A", 0, 2000000, "+", "chr1", 0, 2000000) +
        paf_line("A", 2000000, 4000000, "+", "chr2", 0, 2000000) +
        # ctg B: same chr, same strand, >1m gap -> G
        paf_line("B", 0, 2000000, "+", "chr3", 0, 2000000) +
        paf_line("B", 2000000, 4000000, "+", "chr3", 8000000, 10000000) +
        # ctg C: bracketed inversion -> M
        paf_line("C", 0, 2000000, "+", "chr4", 0, 2000000) +
        paf_line("C", 2000000, 4000000, "-", "chr4", 2000000, 4000000) +
        paf_line("C", 4000000, 6000000, "+", "chr4", 4000000, 6000000))
    out = _run_cmd(P.misjoin, [str(paf)], capsys).out
    assert "# inter-chromosomal misjoins: 1,0" in out
    assert "# intra-chromosomal gaps: 1,0" in out
    assert "# candidate inversions in the middle: 1,0" in out
    assert "# candidate inversions at contig ends: 0,0" in out


def test_ov_eval(tmp_path, capsys):
    from mm2_gb_tpu.tools import paftools as P
    to_ref = tmp_path / "toref.paf"
    # r1 [0,9000) and r2 [5000,14000) overlap 4000 on c1; r3 elsewhere
    to_ref.write_text(
        "r1\t9500\t0\t9300\t+\tc1\t50000\t0\t9000\t9000\t9000\t60"
        "\ttp:A:P\n"
        "r2\t9500\t0\t9300\t+\tc1\t50000\t5000\t14000\t9000\t9000\t60"
        "\ttp:A:P\n"
        "r3\t9500\t0\t9300\t+\tc1\t50000\t30000\t39000\t9000\t9000\t60"
        "\ttp:A:P\n")
    ovl = tmp_path / "ovl.paf"
    ovl.write_text("r1\t9500\t5000\t9300\t+\tr2\t9500\t0\t4000\t4000"
                   "\t4000\t0\n")
    out = _run_cmd(P.ov_eval, [str(to_ref), str(ovl)], capsys).out
    assert "1 overlaps inferred from the reference mapping" in out
    assert "0 missed by the read overlapper" in out
    assert "100.00% sensitivity" in out


def test_paftools_version(capsys):
    from mm2_gb_tpu.tools import paftools as P
    assert _run_cmd(P.version, [], capsys).out == "2.24-r1132-dirty\n"


def test_gff2bed(tmp_path, capsys):
    """gff2bed BED12 + junction output (paftools.js:1533-1693)."""
    from mm2_gb_tpu.tools import paftools as P
    gtf = tmp_path / "t.gtf"
    gtf.write_text(
        'chr1\tH\texon\t101\t200\t.\t+\t.\tgene_id "G1"; transcript_id '
        '"T1"; transcript_type "protein_coding"; gene_name "GENE1"; '
        'transcript_name "T1-201";\n'
        'chr1\tH\tCDS\t121\t180\t.\t+\t.\tgene_id "G1"; transcript_id '
        '"T1"; transcript_type "protein_coding"; gene_name "GENE1"; '
        'transcript_name "T1-201";\n'
        'chr1\tH\texon\t301\t400\t.\t+\t.\tgene_id "G1"; transcript_id '
        '"T1"; transcript_type "protein_coding"; gene_name "GENE1"; '
        'transcript_name "T1-201";\n')
    out = _run_cmd(P.gff2bed, [str(gtf)], capsys).out
    assert out == ("chr1\t100\t400\tT1|protein_coding|GENE1\t1000\t+\t"
                   "120\t180\t0,128,255\t2\t100,100,\t0,200,\n")
    out = _run_cmd(P.gff2bed, ["-j", str(gtf)], capsys).out
    assert out == "chr1\t200\t300\tT1|protein_coding|GENE1\t1000\t+\n"
    out = _run_cmd(P.gff2bed, ["-s", str(gtf)], capsys).out
    assert out.split("\t")[3] == "T1-201|protein_coding"


def test_splice2bed(tmp_path, capsys):
    from mm2_gb_tpu.tools import paftools as P
    sam = tmp_path / "s.sam"
    sam.write_text("r1\t0\tchr1\t101\t60\t50M100N50M\t*\t0\t0\tACGT\t*\n")
    out = _run_cmd(P.splice2bed, [str(sam)], capsys).out
    assert out == ("chr1\t100\t300\tr1\t1000\t+\t100\t300\t0,128,255\t2"
                   "\t50,50,\t0,150,\n")
    # PAF with cg:Z and s2:i (primary marker)
    paf = tmp_path / "s.paf"
    paf.write_text("r1\t100\t0\t100\t+\tchr1\t5000\t100\t300\t100\t200"
                   "\t60\ts2:i:0\tcg:Z:50M100N50M\n")
    out = _run_cmd(P.splice2bed, [str(paf)], capsys).out
    assert out.startswith("chr1\t100\t300\tr1\t500\t+\t100\t300\t"
                          "0,128,255\t2\t50,50,\t0,150,")


def test_delta2paf(tmp_path, capsys):
    from mm2_gb_tpu.tools import paftools as P
    delta = tmp_path / "d.delta"
    delta.write_text("/r /q\nNUCMER\n>ref qry 1000 900\n"
                     "1 500 1 501 2 2 0\n-200\n0\n")
    out = _run_cmd(P.delta2paf, [str(delta)], capsys).out
    assert out == ("qry\t900\t0\t501\t+\tref\t1000\t0\t500\t499\t501\t0"
                   "\tNM:i:2\tcg:Z:199M1I301M\n")


def test_mason2fq(tmp_path, capsys):
    from mm2_gb_tpu.tools import paftools as P
    sam = tmp_path / "m.sam"
    # read pair: r/1 fwd at 100, r/2 rev at 400
    sam.write_text(
        "simulated.1\t65\tchr1\t101\t60\t4M\t*\t0\t0\tACGT\tFFFF"
        "\tXE:i:1\tXS:i:0\tXI:i:0\n"
        "simulated.1\t145\tchr1\t401\t60\t4M\t*\t0\t0\tACGT\tFFFF"
        "\tXE:i:2\tXS:i:1\tXI:i:0\n")
    out = _run_cmd(P.mason2fq, [str(sam)], capsys).out
    lines = out.splitlines()
    assert lines[0] == "@1!chr1!100_400!104_404!+-/1 1:0:0"
    assert lines[1] == "ACGT"
    assert lines[4] == "@1!chr1!100_400!104_404!+-/2 2:1:0"
    # read 2 was reverse flag (16): seq revcomp'd
    assert lines[5] == "ACGT".translate(P._COMP)[::-1]


def test_pbsim2fq(tmp_path, capsys):
    from mm2_gb_tpu.tools import paftools as P
    fai = tmp_path / "r.fai"
    fai.write_text("chrA\t1000\nchrB\t2000\n")
    maf = tmp_path / "p.maf"
    maf.write_text("a\n"
                   "s ref 100 8 + 1000 ACGTACGT\n"
                   "s S2_1 0 8 - 8 ACG-TACGT\n")
    out = _run_cmd(P.pbsim2fq, [str(fai), str(maf)], capsys).out
    lines = out.splitlines()
    assert lines[0] == ">S2_1!chrB!100!108!-"
    assert lines[1] == "ACGTACGT".translate(P._COMP)[::-1]


def test_vcfpair(tmp_path, capsys):
    from mm2_gb_tpu.tools import paftools as P
    vcf = tmp_path / "p.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "##source=test\n"
        "##contig=<ID=chr1,length=1000>\n"
        "##contig=<ID=chrZ,length=5>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tH1\tH2\n"
        "chr1\t100\t.\tA\tG\t.\t.\t.\tGT:AD\t1/1:0,9\t0/0:5,1\n"
        "chr1\t200\t.\tA\tAT\t.\t.\t.\tGT:AD\t./.:2,2\t1/1:0,7\n")
    out = _run_cmd(P.vcfpair, [str(vcf)], capsys).out
    assert "##source=test" not in out        # dropped
    assert "##contig=<ID=chrZ" not in out    # non-canonical contig
    assert "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" \
           "syndip" in out
    assert "chr1\t100\t.\tA\tG\t30\t.\t.\tGT:AD\t1|0:5,10" in out
    assert "chr1\t200\t.\tA\tAT\t30\tGAP1\t.\tGT:AD\t.|1:2,9" in out


def test_vcfsel(tmp_path, capsys):
    from mm2_gb_tpu.tools import paftools as P
    vcf = tmp_path / "v.vcf"
    vcf.write_text("##x\n"
                   "chr1\t10\t.\tA\tG\t.\t.\t.\n"
                   "chr1\t20\t.\tA\tATTTT\t.\t.\t.\n"
                   "chr1\t30\t.\tACC\tA\t.\t.\tSVLEN=-2\n")
    out = _run_cmd(P.vcfsel, ["-l", "2", str(vcf)], capsys).out
    body = [l for l in out.splitlines() if not l.startswith("#")]
    assert len(body) == 2
    assert body[0].startswith("chr1\t20")
    assert body[1].startswith("chr1\t30")


def test_asmstat(tmp_path, capsys):
    from mm2_gb_tpu.tools import paftools as P
    fai = tmp_path / "r.fai"
    fai.write_text("chr1\t1000000\n")
    paf = tmp_path / "asm.paf"
    paf.write_text(
        "ctg1\t500000\t0\t200000\t+\tchr1\t1000000\t0\t200000\t199000"
        "\t200000\t60\ttp:A:P\tNM:i:1000\tcg:Z:200000M\n"
        "ctg1\t500000\t220000\t500000\t+\tchr1\t1000000\t230000\t510000"
        "\t278000\t280000\t60\ttp:A:P\tNM:i:2000\tcg:Z:280000M\n"
        "ctg2\t300000\t0\t300000\t+\tchr1\t1000000\t600000\t900000"
        "\t299000\t300000\t60\ttp:A:P\tNM:i:1000\tcg:Z:300000M\n")
    out = _run_cmd(P.asmstat, [str(fai), str(paf)], capsys).out
    lines = dict(l.split("\t", 1) for l in out.splitlines()[1:])
    assert lines["Length"] == "800000"
    assert lines["l_cov"] == "780000"
    assert lines["Rcov"] == "78.00%"
    assert lines["Qcov"] == "97.50%"
    assert lines["NG50"] == "300000"
    assert lines["NGA50"] == "280000"
    assert lines["#breaks"] == "1"


def test_asmgene(tmp_path, capsys):
    from mm2_gb_tpu.tools import paftools as P
    ref = tmp_path / "ref.paf"
    ref.write_text(
        "g1\t2000\t0\t2000\t+\tchr1\t1000000\t1000\t3100\t1990\t2000"
        "\t60\n"
        "g2\t1500\t0\t1500\t+\tchr1\t1000000\t5000\t6600\t1495\t1500"
        "\t60\n")
    asm = tmp_path / "asm.paf"
    asm.write_text(
        "g1\t2000\t0\t2000\t+\tctg1\t500000\t1000\t3100\t1990\t2000"
        "\t60\n"
        "g2\t1500\t0\t700\t+\tctg1\t500000\t5000\t5750\t698\t700\t60\n")
    out = _run_cmd(P.asmgene, [str(ref), str(asm)], capsys).out
    rows = {l.split("\t")[1]: l.split("\t")[2:]
            for l in out.splitlines() if l.startswith("X")}
    assert rows["full_sgl"] == ["2", "1"]
    assert rows["part10+"] == ["0", "1"]


def test_sveval(tmp_path, capsys):
    from mm2_gb_tpu.tools import paftools as P
    base = tmp_path / "b.vcf"
    base.write_text("##x\n"
                    "chr1\t1000\t.\tA\t" + "A" + "T" * 100 + "\t30\t.\t.\n"
                    "chr1\t5000\t.\t" + "A" * 81 + "\tA\t30\t.\t.\n")
    call = tmp_path / "c.vcf"
    # insertion matches (same pos, len 95 vs 100); deletion missing
    call.write_text("##x\n"
                    "chr1\t1050\t.\tA\t" + "A" + "T" * 95 + "\t30\t.\t.\n")
    out = _run_cmd(P.sveval, [str(base), str(call)], capsys).out
    lines = {l.split("\t")[0]: l for l in out.splitlines()}
    assert lines["SN"] == "SN\t2\t1\t0.500000"
    assert lines["PC"] == "PC\t1\t1\t1.000000"
    assert lines["F1"] == "F1\t0.750000"


def test_mmphase_binning(tmp_path, capsys):
    """mmphase binning mode: het-substitution phasing drops the
    conflicting alignment (mmphase.js find_het_sub + flt_utg_for_bin)."""
    from mm2_gb_tpu.tools import mmphase as M
    paf = tmp_path / "ph.paf"
    paf.write_text(
        "q1\t10000\t0\t10000\t+\tutgA\t20000\t100\t10100\t9990\t10000"
        "\t60\tcs:Z::5000*ac:4999\n"
        "q1\t10000\t0\t10000\t+\tutgB\t20000\t200\t10200\t9500\t10000"
        "\t60\tcs:Z::10000\n")
    rc = M.main([str(paf)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "SQ\tq1\t10000\t2" in out
    assert "TS\t1\t0\t10000\tutgB\t20000\t200\t10200\t1\t10000\t0\t0" \
           "\t0" in out
    assert "TS\t0\t" not in out  # conflicting utgA alignment filtered
    assert out.rstrip().endswith("//")


def test_mmphase_ec(tmp_path, capsys):
    """mmphase error-correction mode: substitutions from the chosen
    phase are applied to the read (mmphase.js ec_core)."""
    from mm2_gb_tpu.tools import mmphase as M
    paf = tmp_path / "ph.paf"
    paf.write_text(
        "q1\t10000\t0\t10000\t+\tutgB\t20000\t200\t10200\t9990\t10000"
        "\t60\tcs:Z::5000*ga:4999\n")
    fa = tmp_path / "q1.fa"
    fa.write_text(">q1\n" + "A" * 10000 + "\n")
    rc = M.main([str(paf), str(fa)])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == ">q1"
    seq = out[1]
    assert len(seq) == 10000
    assert seq[5000] == "g"          # cs *ga: target base g applied
    assert set(seq[:5000]) == {"A"}
