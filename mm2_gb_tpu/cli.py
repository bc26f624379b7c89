"""Command-line driver (main.c analog).

Usage (minimap2-compatible subset):
    python -m mm2_gb_tpu [options] <target.fa> <query.fa> [...]

Options are applied in two passes like the reference (main.c:146-160):
presets (-x) first, explicit flags second.
"""

from __future__ import annotations

import argparse
import sys

from mm2_gb_tpu.models.index import MinimizerIndex
from mm2_gb_tpu.models.mapper import map_frag
from mm2_gb_tpu.utils import opts as O
from mm2_gb_tpu.utils.fastx import read_fastx
from mm2_gb_tpu.utils.paf import write_paf


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mm2-gb-tpu", add_help=True)
    p.add_argument("target")
    p.add_argument("query", nargs="*")
    p.add_argument("-x", dest="preset", default=None)
    p.add_argument("-k", type=int, default=None)
    p.add_argument("-w", type=int, default=None)
    p.add_argument("-H", dest="hpc", action="store_true")
    p.add_argument("-f", dest="mid_occ_frac", type=float, default=None)
    p.add_argument("-g", dest="max_gap", type=int, default=None)
    p.add_argument("-G", dest="max_gap_ref", type=int, default=None)
    p.add_argument("-n", dest="min_cnt", type=int, default=None)
    p.add_argument("-m", dest="min_chain_score", type=int, default=None)
    p.add_argument("-p", dest="pri_ratio", type=float, default=None)
    p.add_argument("-N", dest="best_n", type=int, default=None)
    p.add_argument("-r", dest="bw", type=str, default=None)
    p.add_argument("-c", dest="cigar", action="store_true")
    p.add_argument("-a", dest="sam", action="store_true")
    p.add_argument("-t", dest="threads", type=int, default=3)
    p.add_argument("-d", dest="dump_index", default=None)
    p.add_argument("--max-chain-skip", type=int, default=None)
    p.add_argument("--max-chain-iter", type=int, default=None)
    p.add_argument("--rmq", action="store_true")
    p.add_argument("--tpu-chain", action="store_true",
                   help="run chaining on the TPU (analog of --gpu-chain)")
    p.add_argument("--tpu-cfg", default=None,
                   help="device batch config JSON (analog of --gpu-cfg)")
    p.add_argument("-u", dest="splice_strand", choices=["f", "b", "r", "n"],
                   default=None)
    p.add_argument("-C", dest="noncan", type=int, default=None)
    p.add_argument("--cs", nargs="?", const="short",
                   choices=["short", "long"], default=None)
    p.add_argument("--MD", action="store_true")
    p.add_argument("--eqx", action="store_true")
    p.add_argument("-R", dest="rg", default=None,
                   help="SAM read group line (@RG\\tID:...)")
    p.add_argument("--sam-hit-only", action="store_true")
    p.add_argument("--secondary", choices=["yes", "no"], default="yes")
    p.add_argument("--paf-no-hit", action="store_true")
    p.add_argument("--for-only", action="store_true")
    p.add_argument("--rev-only", action="store_true")
    return p


def apply_overrides(args, io: O.IndexOptions, mo: O.MapOptions) -> None:
    if args.k is not None:
        io.k = args.k
    if args.w is not None:
        io.w = args.w
    if args.hpc:
        io.flag |= O.MM_I_HPC
    if args.mid_occ_frac is not None:
        mo.mid_occ_frac = args.mid_occ_frac
    if args.max_gap is not None:
        mo.max_gap = args.max_gap
    if args.max_gap_ref is not None:
        mo.max_gap_ref = args.max_gap_ref
    if args.min_cnt is not None:
        mo.min_cnt = args.min_cnt
    if args.min_chain_score is not None:
        mo.min_chain_score = args.min_chain_score
    if args.pri_ratio is not None:
        mo.pri_ratio = args.pri_ratio
    if args.best_n is not None:
        mo.best_n = args.best_n
    if args.bw is not None:
        parts = args.bw.split(",")
        mo.bw = int(parts[0])
        if len(parts) > 1:
            mo.bw_long = int(parts[1])
    if args.max_chain_skip is not None:
        mo.max_chain_skip = args.max_chain_skip
    if args.max_chain_iter is not None:
        mo.max_chain_iter = args.max_chain_iter
    if args.rmq:
        mo.flag |= O.MM_F_RMQ
    if args.cigar:
        mo.flag |= O.MM_F_CIGAR | O.MM_F_OUT_CG
    if args.sam:
        mo.flag |= O.MM_F_CIGAR | O.MM_F_OUT_SAM
    if args.cs == "short":
        mo.flag |= O.MM_F_OUT_CS | O.MM_F_CIGAR
    elif args.cs == "long":
        mo.flag |= O.MM_F_OUT_CS | O.MM_F_CIGAR | O.MM_F_OUT_CS_LONG
    if args.MD:
        mo.flag |= O.MM_F_OUT_MD | O.MM_F_CIGAR
    if args.eqx:
        mo.flag |= O.MM_F_EQX
    if args.sam_hit_only:
        mo.flag |= O.MM_F_SAM_HIT_ONLY
    if args.splice_strand is not None:  # main.c:199-205
        mo.flag &= ~(O.MM_F_SPLICE_FOR | O.MM_F_SPLICE_REV)
        if args.splice_strand == "f":
            mo.flag |= O.MM_F_SPLICE_FOR
        elif args.splice_strand == "r":
            mo.flag |= O.MM_F_SPLICE_REV
        elif args.splice_strand == "b":
            mo.flag |= O.MM_F_SPLICE_FOR | O.MM_F_SPLICE_REV
    if args.noncan is not None:
        mo.noncan = args.noncan
    if args.secondary == "no":
        mo.flag |= O.MM_F_NO_PRINT_2ND
    if args.paf_no_hit:
        mo.flag |= O.MM_F_PAF_NO_HIT
    if args.for_only:
        mo.flag |= O.MM_F_FOR_ONLY
    if args.rev_only:
        mo.flag |= O.MM_F_REV_ONLY
    if args.tpu_chain:
        mo.flag |= O.MM_F_TPU_CHAIN
    if args.tpu_cfg:
        mo.tpu_config_file = args.tpu_cfg


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    io, mo = O.set_preset(args.preset)
    apply_overrides(args, io, mo)
    O.check_opt(io, mo)

    if args.target.endswith(".npz"):
        index = MinimizerIndex.load(args.target)
    else:
        index = MinimizerIndex.from_fasta(args.target, io)
    if args.dump_index:
        index.save(args.dump_index)
        if not args.query:
            return 0
    O.mapopt_update(mo, index)

    out = sys.stdout
    if mo.flag & O.MM_F_TPU_CHAIN:
        from mm2_gb_tpu.models.pipeline import map_file_tpu
        for line in map_file_tpu(index, mo, args.query):
            out.write(line + "\n")
        return 0
    is_sam = bool(mo.flag & O.MM_F_OUT_SAM)
    rg_id = None
    if is_sam:
        from mm2_gb_tpu.utils.sam import write_sam_header
        from mm2_gb_tpu import __version__
        if args.rg:
            rg = args.rg.replace("\\t", "\t")
            rg_id = next((f[3:] for f in rg.split("\t")
                          if f.startswith("ID:")), None)
        out.write(write_sam_header(index, args.rg, __version__,
                                   (argv if argv is not None
                                    else sys.argv[1:])) + "\n")
    for path in args.query:
        for rec in read_fastx(path):
            res = map_frag(index, mo, [rec.seq], rec.name)
            if res.regs:
                for j, r in enumerate(res.regs):
                    if (mo.flag & O.MM_F_NO_PRINT_2ND) and r.id != r.parent:
                        continue
                    if is_sam:
                        from mm2_gb_tpu.utils.sam import write_sam_record
                        out.write(write_sam_record(
                            index, rec, j, res.regs, mo.flag, res.rep_len,
                            rg_id) + "\n")
                    else:
                        out.write(write_paf(r, rec.name, rec.length, index,
                                            mo.flag, res.rep_len, rec.comment,
                                            rec.seq) + "\n")
            elif is_sam and not (mo.flag & O.MM_F_SAM_HIT_ONLY):
                from mm2_gb_tpu.utils.sam import write_sam_record
                out.write(write_sam_record(index, rec, -1, res.regs, mo.flag,
                                           res.rep_len, rg_id) + "\n")
            elif (mo.flag & O.MM_F_PAF_NO_HIT) and not is_sam:
                out.write(write_paf(None, rec.name, rec.length, index,
                                    mo.flag, res.rep_len) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
