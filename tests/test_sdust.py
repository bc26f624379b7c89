"""SDUST masking vs the reference's standalone sdust tool output."""

import json

from mm2_gb_tpu.ops.sdust import sdust
from tests.conftest import golden_path


def test_sdust_golden():
    d = json.load(open(golden_path("sdust_cases.json")))
    lines = []
    for i, s in enumerate(d["seqs"]):
        for st, en in sdust(s):
            lines.append(f"s{i}\t{st}\t{en}")
    mine = "\n".join(lines) + ("\n" if lines else "")
    assert mine == d["golden"]


def test_sdust_edges():
    assert sdust("") == []
    assert sdust("ACG") == []
    assert sdust("N" * 100) == []
    iv = sdust("A" * 100)
    assert iv and iv[0][0] == 0 and iv[0][1] == 100
