"""End-to-end byte-match tests against golden reference PAFs.

The golden files were generated with the reference minimap2 v2.24
(`-t 1 --max-chain-skip=2147483647`), the byte-compatibility contract the
TPU build inherits from mm2-gb (reference README "Accuracy evaluation").
"""

import io
import os
import sys

import pytest

from mm2_gb_tpu.cli import main
from tests.conftest import golden_path

PAIRS = [
    ("MT-human.fa", "MT-orang.fa", "MT.skipinf.paf"),
    ("t-inv.fa", "q-inv.fa", "t-inv.skipinf.paf"),
    ("t2.fa", "q2.fa", "t2.skipinf.paf"),
]


@pytest.mark.parametrize("target,query,golden", PAIRS)
def test_paf_byte_match(ref_test_dir, target, query, golden, capsys):
    rc = main(["--max-chain-skip=2147483647",
               os.path.join(ref_test_dir, target),
               os.path.join(ref_test_dir, query)])
    assert rc == 0
    out = capsys.readouterr().out
    with open(golden_path(golden)) as f:
        expected = f.read()
    assert out == expected


CIGAR_PAIRS = [
    ("t-inv.fa", "q-inv.fa", "t-inv.skipinf.c.paf"),
    ("t2.fa", "q2.fa", "t2.skipinf.c.paf"),
]


@pytest.mark.parametrize("target,query,golden", CIGAR_PAIRS)
def test_cigar_paf_byte_match(ref_test_dir, target, query, golden, capsys):
    rc = main(["--max-chain-skip=2147483647", "-c",
               os.path.join(ref_test_dir, target),
               os.path.join(ref_test_dir, query)])
    assert rc == 0
    out = capsys.readouterr().out
    with open(golden_path(golden)) as f:
        assert out == f.read()


def test_sam_byte_match(ref_test_dir, capsys):
    """SAM records match the reference; @PG differs by design (CL/VN)."""
    rc = main(["--max-chain-skip=2147483647", "-a",
               os.path.join(ref_test_dir, "t-inv.fa"),
               os.path.join(ref_test_dir, "q-inv.fa")])
    assert rc == 0
    got = [l for l in capsys.readouterr().out.splitlines()
           if not l.startswith("@PG")]
    with open(golden_path("t-inv.skipinf.sam")) as f:
        want = [l for l in f.read().splitlines() if not l.startswith("@PG")]
    assert got == want
