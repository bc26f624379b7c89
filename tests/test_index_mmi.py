"""Binary .mmi index format interop (mm_idx_dump/load, index.c:463-557)."""

import gzip

import numpy as np
import pytest

from mm2_gb_tpu.models.index import MinimizerIndex
from mm2_gb_tpu.utils.opts import set_preset
from tests.conftest import golden_path


def test_load_reference_mmi(tmp_path, ref_test_dir):
    """An index written by the reference binary loads to the same
    occurrence table our builder produces."""
    mmi = tmp_path / "MT.mmi"
    with gzip.open(golden_path("MT.mmi.gz")) as f:
        mmi.write_bytes(f.read())
    idx = MinimizerIndex.load(str(mmi))
    io, _ = set_preset(None)
    ours = MinimizerIndex.from_fasta(f"{ref_test_dir}/MT-human.fa", io)
    assert idx.k == ours.k and idx.w == ours.w
    assert idx.names == ours.names
    assert np.array_equal(idx.lens, ours.lens)
    assert np.array_equal(idx.occ_hash, ours.occ_hash)
    assert np.array_equal(idx.occ_pos, ours.occ_pos)
    assert np.array_equal(idx.seq_codes, ours.seq_codes)


def test_mmi_roundtrip(tmp_path, ref_test_dir):
    io, _ = set_preset(None)
    idx = MinimizerIndex.from_fasta(f"{ref_test_dir}/MT-human.fa", io)
    path = str(tmp_path / "rt.mmi")
    idx.save(path)
    back = MinimizerIndex.load(path)
    assert np.array_equal(idx.occ_hash, back.occ_hash)
    assert np.array_equal(idx.occ_pos, back.occ_pos)
    assert np.array_equal(idx.seq_codes, back.seq_codes)
    assert idx.names == back.names


def test_multipart_mmi_dump_and_map(tmp_path, capsys):
    """-d with -I appends parts into ONE .mmi (main.c:404+ loop);
    mapping against a multi-part .mmi replays the stored parts per-part
    like the reference's index reader, and the reference binary can read
    our multi-part dump."""
    import gzip
    import os
    import subprocess
    import sys as _sys

    from mm2_gb_tpu.cli import main
    from mm2_gb_tpu.models.index import load_mmi_parts
    from tests.conftest import golden_path

    ref_gz = golden_path("splitq_ref.fa.gz")
    ref_fa = str(tmp_path / "r.fa")
    with gzip.open(ref_gz, "rt") as f:
        open(ref_fa, "w").write(f.read())
    q_gz = golden_path("splitq_q1.fa.gz")
    mmi = str(tmp_path / "mp.mmi")
    rc = main(["-I", "100k", "-d", mmi, ref_fa])
    assert rc == 0
    capsys.readouterr()
    parts = list(load_mmi_parts(mmi))
    assert len(parts) > 1

    # our mapping against our multi-part dump == the reference binary
    # mapping against ITS OWN multi-part dump of the same fasta
    ref_bin = "/tmp/refbuild/minimap2_cpu"
    if not os.path.exists(ref_bin):
        import pytest
        pytest.skip("reference binary unavailable")
    ref_mmi = str(tmp_path / "ref.mmi")
    subprocess.run([ref_bin, "-I", "100k", "-d", ref_mmi, ref_fa],
                   capture_output=True)
    gold = subprocess.run(
        [ref_bin, "-t", "1", "--max-chain-skip=2147483647", "-c",
         ref_mmi, q_gz], capture_output=True, text=True).stdout
    rc = main(["--max-chain-skip=2147483647", "-c", mmi, q_gz])
    assert rc == 0
    assert capsys.readouterr().out == gold

    # interop: the reference binary maps with OUR multi-part dump
    theirs = subprocess.run(
        [ref_bin, "-t", "1", "--max-chain-skip=2147483647", "-c",
         mmi, q_gz], capture_output=True, text=True).stdout
    assert theirs == gold
