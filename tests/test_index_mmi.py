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
