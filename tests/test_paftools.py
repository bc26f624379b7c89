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
