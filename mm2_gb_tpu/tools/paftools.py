"""PAF toolkit subset (misc/paftools.js analog).

Implements the accuracy-evaluation subcommands the reference uses in its
papers (misc/README.md): `mapeval` (ROC over MAPQ from simulated-read
names, paftools.js:2040-2166) and `stat` (alignment statistics,
paftools.js:963-1140).  Both accept PAF or SAM.

Usage:  python -m mm2_gb_tpu.tools.paftools <mapeval|stat> [options] <file>
"""

from __future__ import annotations

import argparse
import gzip
import re
import sys


def _open(path):
    if path == "-":
        return sys.stdin
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path)


_RE_PBSIM = re.compile(r"^(\S+)!(\S+)!(\d+)!(\d+)!([\+\-])$")
_RE_MASON = re.compile(
    r"^(\S+)!(\S+)!(\d+)_(\d+)!(\d+)_(\d+)!([\+\-])([\+\-])/([12])$")
_RE_CIGAR = re.compile(r"(\d+)([MIDSHNX=])")


def _parse_truth(qname: str):
    m = _RE_PBSIM.match(qname)
    if m:
        return [m.group(2), int(m.group(3)), int(m.group(4)), m.group(5)]
    m = _RE_MASON.match(qname)
    if m:
        if m.group(9) == "1":
            return [m.group(2), int(m.group(3)), int(m.group(5)), m.group(7)]
        return [m.group(2), int(m.group(4)), int(m.group(6)), m.group(8)]
    raise SystemExit(f"Failed to parse simulated read name '{qname}'")


def mapeval(argv) -> int:
    ap = argparse.ArgumentParser(prog="paftools mapeval")
    ap.add_argument("-r", dest="ovlp_ratio", type=float, default=0.1)
    ap.add_argument("-Q", dest="err_out_q", type=int, default=None)
    ap.add_argument("-m", dest="mode", type=int, default=0)
    ap.add_argument("input")
    args = ap.parse_args(argv)
    err_out_q = 256 if args.err_out_q is None else args.err_out_q
    max_mapq = 60
    tot = [0] * (max_mapq + 1)
    err = [0] * (max_mapq + 1)
    n_unmapped = None

    def is_correct(s, b) -> bool:
        # overlap/union > ovlp_ratio on the same chr+strand
        if s[0] != b[0] or s[3] != b[3]:
            return False
        if s[1] < b[1]:
            if s[2] <= b[1]:
                return False
            o = min(s[2], b[2]) - b[1]
            l = max(s[2], b[2]) - s[1]
        else:
            if b[2] <= s[1]:
                return False
            o = min(s[2], b[2]) - s[1]
            l = max(s[2], b[2]) - b[1]
        return o / l > args.ovlp_ratio

    def count(qname, a):
        if not a:
            return
        s = _parse_truth(qname)
        if args.mode in (0, 1):
            max_i = 0
            if args.mode == 0:  # longest alignment only
                mx = 0
                for i, r in enumerate(a):
                    if r[5] > mx:
                        mx, max_i = r[5], i
            mapq = a[max_i][4]
            tot[mapq] += 1
            if not is_correct(s, a[max_i]):
                if mapq >= err_out_q:
                    print("E", qname, "\t".join(map(str, a[max_i])))
                err[mapq] += 1
        else:  # all primary alignments
            max_err_mapq, mx_mapq, max_err_i = -1, 0, -1
            for i, r in enumerate(a):
                mx_mapq = max(mx_mapq, r[4])
                if not is_correct(s, r) and r[4] > max_err_mapq:
                    max_err_mapq, max_err_i = r[4], i
            if max_err_mapq >= 0:
                tot[max_err_mapq] += 1
                err[max_err_mapq] += 1
                if max_err_mapq >= err_out_q:
                    print("E", qname, "\t".join(map(str, a[max_err_i])))
            else:
                tot[mx_mapq] += 1

    last = None
    a: list = []
    with _open(args.input) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line[0] == "@":
                continue
            t = line.split("\t")
            if len(t) > 4 and t[4] in "+-":  # PAF
                if last != t[0]:
                    if last is not None:
                        count(last, a)
                    a, last = [], t[0]
                if re.search(r"\ts1:i:\d+", line) and \
                        not re.search(r"\ts2:i:\d+", line):
                    continue  # secondary
                mapq = min(int(t[11]), max_mapq)
                a.append([t[5], int(t[7]), int(t[8]), t[4], mapq, int(t[9])])
            else:  # SAM
                flag = int(t[1])
                read_no = flag >> 6 & 0x3
                qname = t[0]
                if not re.search(r"/[12]$", qname) and read_no in (1, 2):
                    qname = f"{t[0]}/{read_no}"
                if last != qname:
                    if last is not None:
                        count(last, a)
                    a, last = [], qname
                if flag & 0x100:
                    continue
                if (flag & 0x4) or t[2] == "*":
                    n_unmapped = (n_unmapped or 0) + 1
                    continue
                mapq = min(int(t[4]), max_mapq)
                pos = int(t[3]) - 1
                pos_end = pos
                n_gap = mlen = 0
                for m in _RE_CIGAR.finditer(t[5]):
                    ln = int(m.group(1))
                    op = m.group(2)
                    if op == "M":
                        pos_end += ln
                        mlen += ln
                    elif op == "I":
                        n_gap += ln
                    elif op == "D":
                        n_gap += ln
                        pos_end += ln
                score = pos_end - pos
                m = re.search(r"\tNM:i:(\d+)", line)
                if m:
                    nm = int(m.group(1))
                    if nm >= n_gap:
                        score = mlen - (nm - n_gap)
                a.append([t[2], pos, pos_end, "-" if flag & 16 else "+",
                          mapq, score])
    if last is not None:
        count(last, a)

    sum_tot = sum_err = 0
    sum_tot2 = sum_err2 = 0
    q_out = -1
    for q in range(max_mapq, -1, -1):
        if tot[q] == 0:
            continue
        if q_out < 0 or err[q] > 0:
            if q_out >= 0:
                print("Q", q_out, sum_tot, sum_err,
                      f"{sum_err2 / sum_tot2:.9f}", sum_tot2)
            sum_tot = sum_err = 0
            q_out = q
        sum_tot += tot[q]
        sum_err += err[q]
        sum_tot2 += tot[q]
        sum_err2 += err[q]
    print("Q", q_out, sum_tot, sum_err, f"{sum_err2 / sum_tot2:.9f}",
          sum_tot2)
    if n_unmapped is not None:
        print("U", n_unmapped)
    return 0


def stat(argv) -> int:
    ap = argparse.ArgumentParser(prog="paftools stat")
    ap.add_argument("-l", dest="gap_out_len", type=int, default=None)
    ap.add_argument("input")
    args = ap.parse_args(argv)

    n_pri = n_2nd = n_seq = n_cigar_64k = l_tot = l_cov = n_sub = 0
    n_gap = [[0] * 6, [0] * 6]

    def cov_len(regs):
        regs.sort()
        st, en = regs[0]
        l = 0
        for s, e in regs[1:]:
            if s < en:
                en = max(en, e)
            else:
                l += en - st
                st, en = s, e
        return l + en - st

    last = None
    last_qlen = None
    regs: list = []
    with _open(args.input) as f:
        for lineno, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line or line[0] == "@":
                continue
            t = line.split("\t")
            if len(t) < 2:
                continue
            NM = None
            nn = 0
            is_sam = False
            atlen = None
            if len(t) > 4 and t[4] in "+-*":  # PAF
                if t[4] == "*":
                    continue
                if not re.search(r"\ts2:i:\d+", line):
                    n_2nd += 1
                    continue
                m = re.search(r"\tNM:i:(\d+)", line)
                NM = int(m.group(1)) if m else None
                m = re.search(r"\tnn:i:(\d+)", line)
                nn = int(m.group(1)) if m else 0
                m = re.search(r"\tcg:Z:(\S+)", line)
                if not m:
                    sys.stderr.write(f"WARNING: no CIGAR at line {lineno}\n")
                    continue
                cigar = m.group(1)
                tname = t[5]
                qs, qe = int(t[2]), int(t[3])
                aqlen = qe - qs
                is_rev = t[4] == "-"
                rs = int(t[7])
                atlen = int(t[8]) - rs
                ori_qlen = int(t[1])
            else:  # SAM
                flag = int(t[1])
                if (flag & 4) or t[2] == "*" or t[5] == "*":
                    continue
                if flag & 0x100:
                    n_2nd += 1
                    continue
                m = re.search(r"\tNM:i:(\d+)", line)
                NM = int(m.group(1)) if m else None
                m = re.search(r"\tnn:i:(\d+)", line)
                nn = int(m.group(1)) if m else 0
                cigar = t[5]
                tname = t[2]
                rs = int(t[3]) - 1
                aqlen = len(t[9])
                is_sam = True
                is_rev = bool(flag & 0x10)
            n_pri += 1
            if last != t[0]:
                if last is not None:
                    l_tot += last_qlen
                    l_cov += cov_len(regs)
                regs = []
                n_seq += 1
                last = t[0]
            M = tl = ql = sclip = n_cigar = 0
            clip = [0, 0]
            n_gapo = n_gap_all = 0
            for m in _RE_CIGAR.finditer(cigar):
                ln = int(m.group(1))
                op = m.group(2)
                n_cigar += 1
                if op in "M=X":
                    tl += ln
                    ql += ln
                    M += ln
                elif op in "ID":
                    typ = (0 if ln < 50 else 1 if ln < 100 else 2
                           if ln < 300 else 3 if ln < 400 else 4
                           if ln < 1000 else 5)
                    if op == "I":
                        ql += ln
                        n_gap[0][typ] += 1
                    else:
                        tl += ln
                        n_gap[1][typ] += 1
                    if args.gap_out_len is not None and ln >= args.gap_out_len:
                        print(t[0], ql, "-" if is_rev else "+", tname,
                              rs + tl, op, ln)
                    n_gapo += 1
                    n_gap_all += ln
                elif op == "N":
                    tl += ln
                elif op == "S":
                    clip[0 if M == 0 else 1] = ln
                    sclip += ln
                elif op == "H":
                    clip[0 if M == 0 else 1] = ln
            if NM is not None:
                n_sub += max(NM - n_gap_all - nn, 0)
            if n_cigar > 65535:
                n_cigar_64k += 1
            if is_sam:
                qs = clip[1 if is_rev else 0]
                qe = qs + ql
                ori_qlen = clip[0] + ql + clip[1]
            regs.append([qs, qe])
            last_qlen = ori_qlen
    if regs:
        l_tot += last_qlen
        l_cov += cov_len(regs)

    if args.gap_out_len is None:
        print(f"Number of mapped sequences: {n_seq}")
        print(f"Number of primary alignments: {n_pri}")
        print(f"Number of secondary alignments: {n_2nd}")
        print("Number of primary alignments with >65535 CIGAR operations: "
              f"{n_cigar_64k}")
        print(f"Number of bases in mapped sequences: {l_tot}")
        print(f"Number of mapped bases: {l_cov}")
        print(f"Number of substitutions: {n_sub}")
        for gi, what in ((0, "insertions"), (1, "deletions")):
            for typ, rng in enumerate(("[0,50)", "[50,100)", "[100,300)",
                                       "[300,400)", "[400,1000)",
                                       "[1000,inf)")):
                print(f"Number of {what} in {rng}: {n_gap[gi][typ]}")
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in ("mapeval", "stat"):
        sys.stderr.write(__doc__ + "\n")
        return 1
    return {"mapeval": mapeval, "stat": stat}[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
