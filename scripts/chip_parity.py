#!/usr/bin/env python3
"""Chip-vs-CPU byte-identity check for all four mode families.

Builds an adversarial synthetic world — getK rounding ties (v/peak =
x.5), a prob table, a high-copy repeat that overflows the default
histogram bins (exercising grow_bins on both backends), N runs, short
scaffolds (packed-group path) and a long scaffold (streaming path),
multiallelic + indel variant clusters — then runs -hist, -dump,
-completeness and -polish through the CLI twice (MERFIN_PLATFORM=cpu
and =tpu/default accelerator) and byte-compares every output file and
the deterministic stderr lines.

This is the mechanism behind docs/PARITY.md's exactness claim: nothing
float-boundary-sensitive is decided on the device (host-exact getK/bin
tables, integer kover parts, host-side K*/QV math), so the accelerator
run must be byte-identical to the CPU backend.

Usage:  python scripts/chip_parity.py [--bases 5000000] [--backend tpu]
"""

from __future__ import annotations

import argparse
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ALT_OF = {"A": "C", "C": "G", "G": "T", "T": "A"}


def build_world(tmp: str, total_bases: int, k: int = 21):
    rng = random.Random(99)

    def dna(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    # long scaffold with a high-copy homopolymer repeat + N runs
    long_len = max(200_000, total_bases - 120_000)
    body = list(dna(long_len))
    rep_at = long_len // 3
    body[rep_at: rep_at + 30_000 + k - 1] = "A" * (30_000 + k - 1)
    body[long_len // 2: long_len // 2 + 50] = "N" * 50
    long_scaf = "".join(body)

    shorts = [dna(rng.randrange(150, 3000)) for _ in range(40)]
    scaffolds = [("chrL", long_scaf)] + [
        (f"scaf{i}", s) for i, s in enumerate(shorts)]

    # reads: every scaffold at multiple coverages so raw values hit the
    # round-half (v/peak = x.5) ties for peak = 2.0: v in {1..12}
    reads = []
    for _, s in scaffolds:
        reads.append(s)
    collapsed = long_scaf.replace("A" * (30_000 + k - 1), "A" * k)
    for cov, frac in ((1, 1.0), (2, 0.8), (4, 0.6), (6, 0.4), (11, 0.2)):
        for _ in range(cov):
            reads.append(collapsed[: int(len(collapsed) * frac)])
    novel = dna(5_000)
    reads.append(novel)   # read-only k-mers (completeness path)

    # assembly errors + a VCF: true corrections, spurious calls, one
    # multiallelic site, insertions/deletions, clusters at boundaries
    asm_rows = []
    asm = list(long_scaf)
    vcf_rows = []
    for i in range(30):
        # first 5 variants merge into ONE cluster (2^5 paths); the rest
        # stay separate — exactness coverage without comb=15 weight
        p = 1000 + i * 30 if i < 5 else 1200 + i * 101
        ref = asm[p]
        if ref == "N":
            continue
        if i % 3 == 0:
            asm[p] = ALT_OF[ref]
            vcf_rows.append((p, asm[p], ref, "1/1"))          # true fix
        elif i % 3 == 1:
            vcf_rows.append((p, ref, ALT_OF[ref], "1/1"))     # spurious
        else:
            a1 = ALT_OF[ref]
            vcf_rows.append((p, ref, f"{a1},{ALT_OF[a1]}", "1/2"))
    p = 5000
    vcf_rows.append((p, asm[p], asm[p] + "ACG", "1/1"))       # insertion
    vcf_rows.append((2, asm[2], ALT_OF[asm[2]], "1/1"))       # near start
    asm_long = "".join(asm)
    scaffolds[0] = ("chrL", asm_long)

    fasta = os.path.join(tmp, "asm.fasta")
    with open(fasta, "w") as f:
        for name, s in scaffolds:
            f.write(f">{name}\n{s}\n")
    readsf = os.path.join(tmp, "reads.fasta")
    with open(readsf, "w") as f:
        for i, s in enumerate(reads):
            f.write(f">r{i}\n{s}\n")
    vcf = os.path.join(tmp, "calls.vcf")
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n##contig=<ID=chrL>\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        for p, ref, alt, gt in sorted(vcf_rows):
            f.write(f"chrL\t{p + 1}\t.\t{ref}\t{alt}\t31.7\tPASS\t.\t"
                    f"GT\t{gt}\n")
    prob = os.path.join(tmp, "probs.txt")
    with open(prob, "w") as f:
        f.write("1,0.931\n1,0.871\n2,0.773\n2,0.597\n3,0.401\n")
    return fasta, readsf, vcf, prob


def run_cli(args, platform: str, tmp: str, tag: str):
    env = dict(os.environ)
    env["MERFIN_PLATFORM"] = platform
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    err = os.path.join(tmp, f"{tag}.{platform}.stderr")
    with open(err, "wb") as ef:
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bin", "merfin-tpu")] + args,
            env=env, stderr=ef, stdout=subprocess.DEVNULL).returncode
    assert rc == 0, (tag, platform, open(err).read()[-2000:])
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases", type=int, default=5_000_000)
    ap.add_argument("--backend", default="axon",
                    help="accelerator platform to compare against cpu")
    ap.add_argument("--tmp", default=None)
    a = ap.parse_args()

    import tempfile

    tmp = a.tmp or tempfile.mkdtemp(prefix="chip_parity_")
    print(f"-- world in {tmp} ({a.bases} bases)", flush=True)
    fasta, readsf, vcf, prob = build_world(tmp, a.bases)

    subprocess.run([sys.executable, os.path.join(REPO, "bin", "merfin-tpu"),
                    "count", "k=21", readsf,
                    f"output={tmp}/read.mkdb"], check=True,
                   env={**os.environ, "MERFIN_PLATFORM": "cpu",
                        "PYTHONPATH": REPO + os.pathsep
                        + os.environ.get("PYTHONPATH", "")},
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    subprocess.run([sys.executable, os.path.join(REPO, "bin", "merfin-tpu"),
                    "count", "k=21", fasta,
                    f"output={tmp}/asm.mkdb"], check=True,
                   env={**os.environ, "MERFIN_PLATFORM": "cpu",
                        "PYTHONPATH": REPO + os.pathsep
                        + os.environ.get("PYTHONPATH", "")},
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    base = ["-sequence", fasta, "-readmers", f"{tmp}/read.mkdb",
            "-seqmers", f"{tmp}/asm.mkdb", "-peak", "2.0", "-prob", prob]
    jobs = {
        "hist": ["-hist"] + base + ["-output", "{out}"],
        "dump": ["-dump"] + base + ["-output", "{out}"],
        "compl": ["-completeness", "-readmers", f"{tmp}/read.mkdb",
                  "-seqmers", f"{tmp}/asm.mkdb", "-peak", "2.0",
                  "-prob", prob],
        "polish": ["-polish"] + base + ["-vcf", vcf, "-output", "{out}"],
        "strict": ["-strict"] + base + ["-vcf", vcf, "-output", "{out}"],
    }
    suffix = {"polish": ".polish.vcf", "strict": ".filter.vcf"}

    failures = []
    for tag, args in jobs.items():
        outs = {}
        for platform in ("cpu", a.backend):
            out = os.path.join(tmp, f"{tag}.{platform}.out")
            argv = [x.format(out=out) for x in args]
            err = run_cli(argv, platform, tmp, tag)
            path = out + suffix.get(tag, "")
            outs[platform] = (path if "{out}" in " ".join(args) else None,
                              err)
        p_cpu, e_cpu = outs["cpu"]
        p_acc, e_acc = outs[a.backend]
        ok = True
        if p_cpu and os.path.exists(p_cpu):
            ok &= open(p_cpu, "rb").read() == open(p_acc, "rb").read()
        # stderr: drop environment-dependent lines (memory estimates,
        # device banners) — keep per-sequence/QV/completeness lines
        def sig(p):
            keep = []
            for ln in open(p, "rb").read().splitlines():
                if ln.startswith((b"--", b"WARNING", b"E", b"I")) \
                        or b"Platform" in ln:
                    continue
                keep.append(ln)
            return b"\n".join(keep)
        ok &= sig(e_cpu) == sig(e_acc)
        print(f"{tag}: {'BYTE-IDENTICAL' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures.append(tag)
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("all mode families byte-identical across backends")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
