"""Randomized differential campaign: random read profiles × random flag
subsets, our CLI vs the reference binary, byte-diff everything."""
import random
import subprocess
import sys
import time

REF = "/tmp/refbuild/minimap2_cpu"
B = "ACGT"


def rnd_seq(n, rng):
    return "".join(rng.choice(B) for _ in range(n))


def make_workload(seed):
    rng = random.Random(seed)
    style = rng.randrange(5)
    ref_len = rng.randrange(20_000, 400_000)
    ref = []
    if style == 3:  # repeat-rich reference
        unit = rnd_seq(rng.randrange(50, 2000), rng)
        while sum(map(len, ref)) < ref_len:
            ref.append(unit if rng.random() < 0.5 else rnd_seq(1000, rng))
        ref = "".join(ref)[:ref_len]
    else:
        ref = rnd_seq(ref_len, rng)
    comp = str.maketrans("ACGT", "TGCA")
    reads = []
    n_reads = rng.randrange(10, 60)
    for i in range(n_reads):
        if rng.random() < 0.1:  # unrelated read
            reads.append(rnd_seq(rng.randrange(100, 3000), rng))
            continue
        ln = rng.randrange(100, min(30_000, ref_len))
        st = rng.randrange(0, ref_len - ln)
        s = list(ref[st:st + ln])
        sub = rng.uniform(0, 0.12)
        ind = rng.uniform(0, 0.03)
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
        s = "".join(out)
        if rng.random() < 0.05:  # planted inversion
            m = len(s) // 2
            w = rng.randrange(100, max(101, len(s) // 3))
            seg = s[m:m + w]
            s = s[:m] + seg.translate(comp)[::-1] + s[m + w:]
        if rng.random() < 0.5:
            s = s.translate(comp)[::-1]
        reads.append(s)
    with open("/tmp/fz_ref.fa", "w") as f:
        f.write(">fr\n")
        for i in range(0, len(ref), 80):
            f.write(ref[i:i + 80] + "\n")
    with open("/tmp/fz_q.fa", "w") as f:
        for i, s in enumerate(reads):
            f.write(f">q{i}\n{s}\n")

    flag_pool = [
        [], ["-c"], ["-c", "--cs"], ["-a"], ["-c", "--eqx"],
        ["-x", "map-pb", "-c"], ["-x", "map-hifi", "-c"],
        ["-x", "asm20", "-c"], ["-x", "ava-ont"], ["-N", "10", "-c"],
        ["-p", "0.6", "-c"], ["-r", "100", "-c"], ["-k", "17", "-c"],
        ["-w", "5", "-c"], ["--rmq=yes", "-c"], ["-T", "20", "-c"],
        ["-A", "1", "-B", "9", "-O", "16,41", "-E", "2,1", "-c"],
        ["--for-only", "-c"], ["-g", "1000", "-c"], ["-z", "200", "-c"],
        ["--tpu-chain", "-c", "--cs"], ["--tpu-chain", "--tpu-align", "-c"],
    ]
    return rng.choice(flag_pool)


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    fails = 0
    for it in range(n_iters):
        seed = seed0 + it
        flags = make_workload(seed)
        ref_flags = ["-t", "1", "--max-chain-skip=2147483647"] + [
            f for f in flags if not f.startswith("--tpu")]
        our_flags = ["--max-chain-skip=2147483647"] + [
            f if f != "--rmq=yes" else "--rmq" for f in flags]
        g = subprocess.run([REF] + ref_flags + ["/tmp/fz_ref.fa", "/tmp/fz_q.fa"],
                           capture_output=True, text=True)
        o = subprocess.run([sys.executable, "-m", "mm2_gb_tpu"] + our_flags
                           + ["/tmp/fz_ref.fa", "/tmp/fz_q.fa"],
                           capture_output=True, text=True, timeout=900)
        gold = "\n".join(l for l in g.stdout.splitlines()
                         if not l.startswith("@PG"))
        ours = "\n".join(l for l in o.stdout.splitlines()
                         if not l.startswith("@PG"))
        if gold != ours or o.returncode != 0:
            fails += 1
            print(f"FAIL seed={seed} flags={flags} rc={o.returncode}")
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
            print(f"ok   seed={seed} flags={' '.join(flags) or '(default)'} "
                  f"lines={len(gold.splitlines())}")
    print(f"\n{n_iters - fails}/{n_iters} matched")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
