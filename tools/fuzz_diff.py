"""Randomized differential campaign: random read profiles × random flag
subsets, our CLI vs the reference binary, byte-diff everything.

Workload kinds (chosen per seed):
  genomic  — random/repeat-rich reference, long reads with subs/indels and
             occasionally planted inversions; broad flag pool.
  splice   — exon/intron genome with GT..AG introns, spliced cDNA reads;
             splice presets, -u strand modes, optional --junc-bed.
  pe       — short paired-end reads in FR orientation; -x sr.
Each worker uses seed-private file names, so parallel campaigns don't race.
"""
import os
import random
import subprocess
import sys

REF = "/tmp/refbuild/minimap2_cpu"
B = "ACGT"


def rnd_seq(n, rng):
    return "".join(rng.choice(B) for _ in range(n))


def mutate(s, rng, sub, ind):
    out = []
    for c in s:
        r = rng.random()
        if r < sub:
            out.append(rng.choice(B))
        elif r < sub + ind / 2:
            pass
        elif r < sub + ind:
            out.append(c)
            out.append(rng.choice(B))
        else:
            out.append(c)
    return "".join(out)


def write_fa(path, recs):
    with open(path, "w") as f:
        for name, s in recs:
            f.write(f">{name}\n")
            for i in range(0, len(s), 80):
                f.write(s[i:i + 80] + "\n")


def make_genomic(rng, tag):
    style = rng.randrange(5)
    ref_len = rng.randrange(20_000, 400_000)
    if style == 3:  # repeat-rich reference
        parts = []
        unit = rnd_seq(rng.randrange(50, 2000), rng)
        while sum(map(len, parts)) < ref_len:
            parts.append(unit if rng.random() < 0.5 else rnd_seq(1000, rng))
        ref = "".join(parts)[:ref_len]
    else:
        ref = rnd_seq(ref_len, rng)
    comp = str.maketrans("ACGT", "TGCA")
    reads = []
    for i in range(rng.randrange(10, 60)):
        if rng.random() < 0.1:  # unrelated read
            reads.append((f"q{i}", rnd_seq(rng.randrange(100, 3000), rng)))
            continue
        ln = rng.randrange(100, min(30_000, ref_len))
        st = rng.randrange(0, ref_len - ln)
        s = mutate(ref[st:st + ln], rng,
                   rng.uniform(0, 0.12), rng.uniform(0, 0.03))
        if rng.random() < 0.05:  # planted inversion
            m = len(s) // 2
            w = rng.randrange(100, max(101, len(s) // 3))
            seg = s[m:m + w]
            s = s[:m] + seg.translate(comp)[::-1] + s[m + w:]
        if rng.random() < 0.5:
            s = s.translate(comp)[::-1]
        reads.append((f"q{i}", s))
    rfa, qfa = f"/tmp/fz_{tag}_r.fa", f"/tmp/fz_{tag}_q.fa"
    if rng.random() < 0.3:  # multi-contig reference (exercises rid paths)
        n_ctg = rng.randrange(2, 5)
        cuts = sorted(rng.sample(range(5000, max(5001, ref_len - 5000)),
                                 n_ctg - 1))
        bounds = [0] + cuts + [ref_len]
        write_fa(rfa, [(f"ctg{k}", ref[bounds[k]:bounds[k + 1]])
                       for k in range(n_ctg)])
        multi_ctg = True
    else:
        write_fa(rfa, [("fr", ref)])
        multi_ctg = False
    write_fa(qfa, reads)
    flag_pool = [
        [], ["-c"], ["-c", "--cs"], ["-a"], ["-c", "--eqx"],
        ["-x", "map-pb", "-c"], ["-x", "map-hifi", "-c"],
        ["-x", "asm20", "-c"], ["-x", "ava-ont"], ["-N", "10", "-c"],
        ["-p", "0.6", "-c"], ["-r", "100", "-c"], ["-k", "17", "-c"],
        ["-w", "5", "-c"], ["--rmq=yes", "-c"], ["-T", "20", "-c"],
        ["-A", "1", "-B", "9", "-O", "16,41", "-E", "2,1", "-c"],
        ["--for-only", "-c"], ["-g", "1000", "-c"], ["-z", "200", "-c"],
        ["--qstrand", "-c"], ["--qstrand", "-c", "--cs"],
        ["--cs=long", "-c"], ["-a", "--MD"], ["-a", "--eqx"],
        ["--tpu-chain", "-c", "--cs"], ["--tpu-chain", "--tpu-align", "-c"],
        # max_occ > mid_occ exercises the post-device re-chain branch
        ["--tpu-chain", "-f", "0.0002,5000", "-c"],
        ["--tpu-chain", "-f", "0.001,50", "-c"],
        ["-f", "0.0002,5000", "-c"],
        # round-1 flag-surface completion
        ["-P", "-c"], ["-D", "-c"], ["--end-bonus", "12", "-c"],
        ["--max-qlen", "50k", "-c"], ["--chain-skip-scale", "0.5", "-c"],
        ["--chain-gap-scale", "1.5", "-c"], ["--mask-len", "500", "-c"],
        ["--max-clip-ratio", "0.2", "-c"], ["--no-end-flt", "-c"],
        ["--hard-mask-level", "-c"], ["--no-hash-name", "-c"],
        ["--min-dp-len", "500", "-c"], ["--score-N", "0", "-c"],
        ["-f", "30", "-c"], ["-e", "200", "-c"], ["--q-occ-frac", "0.05"],
        ["--no-long-join", "-c"], ["-M", "0.3", "-c"], ["-N", "0", "-c"],
        ["--cap-sw-mem", "1m", "-c"], ["-a", "-Y"], ["-a", "-Q"],
        ["--heap-sort=yes", "-c"], ["--dual=no"], ["-g", "2k", "-c"],
        # round-3 additions: HPC sketching, large k/w, secondary modes
        ["-H"], ["-H", "-c"], ["-H", "-x", "map-pb", "-c"],
        ["-k", "19", "-w", "19", "-c"], ["-k", "28", "-w", "28"],
        ["--secondary", "no", "-c"], ["-p", "0.9", "-N", "2", "-c"],
    ]
    if multi_ctg:  # multi-part index build + two-phase merge
        flag_pool += [["-I", "100k", "--split-prefix", f"/tmp/fz_{tag}_sp",
                       "-c"]] * 4
        flag_pool += [["-I", "100k", "--tpu-chain", "-c"],
                      ["-I", "100k", "--split-prefix",
                       f"/tmp/fz_{tag}_tsp", "--tpu-chain", "-c"]]
    if rng.random() < 0.15:
        # second query file, NO frag mode: per-file sequential mapping
        # (main.c:451-455), and with --split-prefix the reference's
        # tmp-truncation + interleaved-merge quirk (splitmerge.py)
        q2 = f"/tmp/fz_{tag}_q2.fa"
        write_fa(q2, [(f"r{i}", s) for i, (_n, s) in
                      enumerate(reads[:rng.randrange(3, len(reads) + 1)])])
        pool2 = [[], ["-c"], ["-a"],
                 ["--split-prefix", f"/tmp/fz_{tag}_m2", "-c"],
                 ["--split-prefix", f"/tmp/fz_{tag}_m2"],
                 ["-I", "100k", "--split-prefix", f"/tmp/fz_{tag}_m2",
                  "-c"]]
        return rng.choice(pool2), [rfa, qfa, q2]
    return rng.choice(flag_pool), [rfa, qfa]


def make_splice(rng, tag):
    comp = str.maketrans("ACGT", "TGCA")
    glen = rng.randrange(40_000, 200_000)
    genome = rnd_seq(glen, rng)
    reads = []
    for i in range(rng.randrange(8, 25)):
        n_ex = rng.randrange(2, 7)
        pos = rng.randrange(0, glen - 25_000)
        exons = []
        for _ in range(n_ex):
            elen = rng.randrange(60, 600)
            if pos + elen >= glen - 12_000:
                break
            exons.append((pos, pos + elen))
            intron = rng.randrange(80, 8_000)
            pos += elen + intron
        if len(exons) < 2:
            continue
        # canonical splice sites help the junction model; plant GT..AG
        g = list(genome)
        for (s0, e0), (s1, _) in zip(exons[:-1], exons[1:]):
            g[e0], g[e0 + 1] = "G", "T"
            g[s1 - 2], g[s1 - 1] = "A", "G"
        genome = "".join(g)
        cdna = "".join(genome[s0:e0] for s0, e0 in exons)
        cdna = mutate(cdna, rng, rng.uniform(0, 0.08), rng.uniform(0, 0.02))
        if rng.random() < 0.5:
            cdna = cdna.translate(comp)[::-1]
        reads.append((f"t{i}", cdna))
    rfa, qfa = f"/tmp/fz_{tag}_r.fa", f"/tmp/fz_{tag}_q.fa"
    write_fa(rfa, [("g", genome)])
    write_fa(qfa, reads)
    flag_pool = [
        ["-x", "splice"], ["-x", "splice", "-c"],
        ["-x", "splice", "-c", "--cs"], ["-x", "splice", "-a"],
        ["-x", "splice", "-u", "f", "-c"], ["-x", "splice", "-u", "b", "-c"],
        ["-x", "splice", "-C", "5", "-c"], ["-x", "splice:hq", "-c"],
        ["-x", "splice", "-G", "10000", "-c"],
        ["-x", "splice", "--splice-flank=no", "-c"],
        ["-x", "splice", "--max-intron-len", "20k", "-c"],
        ["-x", "splice", "--cost-non-gt-ag", "4", "-c"],
        ["--splice", "-u", "b", "-c"],
        # device splice: is_cdna chain kernel + exts2 device fills
        ["-x", "splice", "-c", "--tpu-chain"],
        ["-x", "splice", "-c", "--tpu-chain", "--tpu-align"],
        ["-x", "splice", "-u", "b", "-c", "--tpu-chain", "--tpu-align"],
        # splice through the split-prefix dump+merge
        ["-x", "splice", "-c", "--split-prefix", f"/tmp/fz_{tag}_ssp"],
        ["-x", "splice", "-a", "--split-prefix", f"/tmp/fz_{tag}_ssp"],
    ]
    return rng.choice(flag_pool), [rfa, qfa]


def make_pe(rng, tag):
    comp = str.maketrans("ACGT", "TGCA")
    ref_len = rng.randrange(50_000, 300_000)
    ref = rnd_seq(ref_len, rng)
    r1, r2 = [], []
    rl = rng.randrange(70, 151)
    for i in range(rng.randrange(40, 200)):
        frag = rng.randrange(2 * rl, 700)
        st = rng.randrange(0, ref_len - frag)
        fwd = ref[st:st + rl]
        rev = ref[st + frag - rl:st + frag].translate(comp)[::-1]
        fwd = mutate(fwd, rng, rng.uniform(0, 0.02), rng.uniform(0, 0.002))
        rev = mutate(rev, rng, rng.uniform(0, 0.02), rng.uniform(0, 0.002))
        r1.append((f"p{i}", fwd))
        r2.append((f"p{i}", rev))
    rfa = f"/tmp/fz_{tag}_r.fa"
    q1, q2 = f"/tmp/fz_{tag}_1.fa", f"/tmp/fz_{tag}_2.fa"
    write_fa(rfa, [("pr", ref)])
    write_fa(q1, r1)
    write_fa(q2, r2)
    flag_pool = [
        ["-x", "sr"], ["-x", "sr", "-a"], ["-x", "sr", "-c"],
        ["-x", "sr", "-a", "--secondary", "no"],
        ["-x", "sr", "--no-pairing"], ["-x", "sr", "-a", "-Q"],
        ["--sr", "--frag", "yes"],
        # paired-end through the split-prefix dump+merge (mm_pair gets
        # the dumped frag_gap, map.c:1264)
        ["-x", "sr", "-a", "--split-prefix", f"/tmp/fz_{tag}_psp"],
        ["-x", "sr", "-c", "--split-prefix", f"/tmp/fz_{tag}_psp"],
    ]
    return rng.choice(flag_pool), [rfa, q1, q2]


def make_workload(seed):
    rng = random.Random(seed)
    kind = rng.choices(["genomic", "splice", "pe"], [0.6, 0.25, 0.15])[0]
    flags, files = {"genomic": make_genomic, "splice": make_splice,
                    "pe": make_pe}[kind](rng, seed)
    return kind, flags, files


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    fails = 0
    for it in range(n_iters):
        seed = seed0 + it
        kind, flags, files = make_workload(seed)
        ref_flags = ["-t", "1", "--max-chain-skip=2147483647"] + [
            f for f in flags if not f.startswith("--tpu")]
        our_flags = ["--max-chain-skip=2147483647"] + [
            f if f != "--rmq=yes" else "--rmq" for f in flags]
        g = subprocess.run([REF] + ref_flags + files,
                           capture_output=True, text=True)
        env = dict(os.environ)
        if env.get("JAX_PLATFORMS") == "cpu":
            # harden against axon stalls: the sitecustomize hook overrides
            # JAX_PLATFORMS, so the child must unregister it itself
            env["MM2TPU_FORCE_CPU"] = "1"
        try:
            o = subprocess.run([sys.executable, "-m", "mm2_gb_tpu"]
                               + our_flags + files, capture_output=True,
                               text=True, timeout=900, env=env)
        except subprocess.TimeoutExpired:
            # a shared-tunnel stall, not a divergence: skip, don't abort
            print(f"SKIP seed={seed} kind={kind} flags={flags} (timeout; "
                  "run with JAX_PLATFORMS=cpu to avoid tunnel stalls)")
            continue
        gold = "\n".join(l for l in g.stdout.splitlines()
                         if not l.startswith("@PG"))
        ours = "\n".join(l for l in o.stdout.splitlines()
                         if not l.startswith("@PG"))
        if gold != ours or o.returncode != 0:
            fails += 1
            print(f"FAIL seed={seed} kind={kind} flags={flags} "
                  f"rc={o.returncode}")
            for i, (a, b) in enumerate(zip(gold.splitlines(),
                                           ours.splitlines())):
                if a != b:
                    print(f"  line {i}:\n   ref: {a[:160]}\n   our: {b[:160]}")
                    break
            if len(gold.splitlines()) != len(ours.splitlines()):
                print(f"  line counts: ref={len(gold.splitlines())} "
                      f"ours={len(ours.splitlines())}")
            if o.returncode != 0:
                print("  stderr:", o.stderr[-500:])
        else:
            print(f"ok   seed={seed} {kind:8s} "
                  f"flags={' '.join(flags) or '(default)'} "
                  f"lines={len(gold.splitlines())}")
    print(f"\n{n_iters - fails}/{n_iters} matched")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
