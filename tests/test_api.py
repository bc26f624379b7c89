"""mappy-compatible API tests (python/README.rst usage script)."""

import mm2_gb_tpu.api as mp
from tests.conftest import golden_path

REF = "/root/reference/test/MT-human.fa"
QRY = "/root/reference/test/MT-orang.fa"


def test_aligner_usage():
    import os
    if not os.path.exists(REF):
        import pytest
        pytest.skip("no reference test data")
    a = mp.Aligner(REF)
    assert a
    s = a.seq("MT_human", 100, 200)
    assert len(s) == 100
    assert mp.revcomp(mp.revcomp(s)) == s
    hits = []
    for name, seq, qual in mp.fastx_read(QRY):
        hits.extend(a.map(seq, cs=True))
    assert hits
    h = hits[0]
    assert h.ctg == "MT_human" and h.is_primary
    assert h.cigar_str and h.cs
    assert h.blen >= h.mlen > 0
    line = str(h)
    assert "tp:A:P" in line and "cg:Z:" in line and "cs:Z:" in line


def test_aligner_seq_mode_and_pe():
    ref = "ACGTACGTTGCAGGCTTACGGATCTGCTGCATTGCATGCAGCTAGCTAGCTGATCGATCG" * 20
    a = mp.Aligner(seq=ref, preset="sr")
    assert a and a.seq_names == ["N/A"]
    r1 = ref[100:250]
    r2 = mp.revcomp(ref[400:550])
    hits = list(a.map(r1, r2))
    assert any(h.read_num == 1 for h in hits)
    assert any(h.read_num == 2 for h in hits)


def test_aligner_missing_seq():
    a = mp.Aligner(seq="ACGT" * 100)
    assert a.seq("nope") is None
    assert a.seq("N/A", 10_000) is None
