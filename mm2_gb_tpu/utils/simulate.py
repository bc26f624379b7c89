"""Synthetic read simulation for benchmarks and tests.

Generates a random reference and ONT-like reads with substitutions and
indels — the anchor statistics (density, gap structure) approximate the
10–100 kb nanopore workload the reference benchmarks against
(BASELINE.md configs).
"""

from __future__ import annotations

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_reference(length: int, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    return rng.choice(_BASES, length).tobytes().decode()


def simulate_read(ref: str, start: int, length: int, *, sub_rate=0.04,
                  ins_rate=0.005, del_rate=0.005, rev=False,
                  seed: int = 0) -> str:
    """One noisy read from ref[start:start+length]."""
    rng = np.random.default_rng(seed)
    frag = np.frombuffer(ref[start:start + length].encode(), np.uint8).copy()
    # substitutions
    sub = rng.random(frag.shape[0]) < sub_rate
    frag[sub] = _BASES[rng.integers(0, 4, int(sub.sum()))]
    # deletions
    keep = rng.random(frag.shape[0]) >= del_rate
    frag = frag[keep]
    # insertions
    ins = rng.random(frag.shape[0]) < ins_rate
    n_ins = int(ins.sum())
    if n_ins:
        pos = np.nonzero(ins)[0]
        frag = np.insert(frag, pos, _BASES[rng.integers(0, 4, n_ins)])
    seq = frag.tobytes().decode()
    if rev:
        from mm2_gb_tpu.utils.fastx import revcomp
        seq = revcomp(seq)
    return seq


def simulate_readset(ref: str, n_reads: int, min_len: int, max_len: int,
                     seed: int = 0, **noise) -> list[tuple[str, str]]:
    """Returns [(name, seq)] with lengths uniform in [min_len, max_len]."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_reads):
        ln = int(rng.integers(min_len, max_len + 1))
        ln = min(ln, len(ref) - 1)
        st = int(rng.integers(0, len(ref) - ln))
        rev = bool(rng.integers(0, 2))
        seq = simulate_read(ref, st, ln, rev=rev, seed=seed * 100003 + i,
                            **noise)
        out.append((f"read{i}_{st}_{ln}{'-' if rev else '+'}", seq))
    return out
