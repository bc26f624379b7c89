"""Deterministic merge of multi-host PAF shards (SURVEY.md §5.8).

Each rank of a `--tpu-nproc N -o OUT` run writes OUT.shard<r> plus
OUT.shard<r>.idx with one `(file_ordinal, global_read_idx, n_lines)`
record per mapped read.  This tool k-way-merges the shards by
(file_ordinal, global_read_idx) — the same order a single-host run
emits, so the merged bytes equal the single-host output.

Usage:  python -m mm2_gb_tpu.tools.mergeshards <OUT> <N> [> merged.paf]
"""

from __future__ import annotations

import heapq
import sys


def merge(prefix: str, nproc: int, out) -> int:
    streams = []
    for r in range(nproc):
        sh = open(f"{prefix}.shard{r}")
        idx = open(f"{prefix}.shard{r}.idx")
        streams.append((sh, idx))

    heap = []

    def push(r):
        sh, idx = streams[r]
        line = idx.readline()
        if not line:
            return
        fi, gidx, n_lines = (int(v) for v in line.split("\t"))
        chunk = "".join(sh.readline() for _ in range(n_lines))
        heapq.heappush(heap, (fi, gidx, r, chunk))

    for r in range(nproc):
        push(r)
    while heap:
        _fi, _gidx, r, chunk = heapq.heappop(heap)
        out.write(chunk)
        push(r)
    for sh, idx in streams:
        sh.close()
        idx.close()
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        sys.stderr.write(__doc__ + "\n")
        return 1
    return merge(argv[0], int(argv[1]), sys.stdout)


if __name__ == "__main__":
    sys.exit(main())
