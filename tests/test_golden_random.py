"""Randomized golden tests: synthetic FASTQ with adversarial shapes (variable
lengths, N runs, quality extremes, tiny reads) run through the full CLI and
diffed against the reference binary."""

from __future__ import annotations

import json
import random
from pathlib import Path

import pytest

from .oracle import compare_json, diff_fastq, read_fastq
from .test_golden_se import run_ours


def gen_fastq(path: Path, n: int, seed: int, paired_with: Path | None = None):
    rng = random.Random(seed)
    bases = "ACGTN"
    with open(path, "wb") as f1, \
            (open(paired_with, "wb") if paired_with else open(os.devnull, "wb")) as f2:
        for i in range(n):
            length = rng.choice([1, 2, 5, 8, 15, 31, 33, 50, 75, 120, 151, 163])
            seq = "".join(rng.choices(bases, weights=[24, 24, 24, 24, 4], k=length))
            qual = "".join(chr(rng.randint(33, 73)) for _ in range(length))
            # some reads get polyG / polyX tails
            roll = rng.random()
            if roll < 0.1 and length > 20:
                tail = rng.randint(8, min(30, length - 1))
                seq = seq[:-tail] + "G" * tail
            elif roll < 0.15 and length > 20:
                tail = rng.randint(8, min(30, length - 1))
                seq = seq[:-tail] + "A" * tail
            name = f"@R{i}:{rng.randint(1,9999)}:{seed} 1:N:0:ACGTAC"
            f1.write(f"{name}\n{seq}\n+\n{qual}\n".encode())
            if paired_with:
                length2 = rng.choice([1, 5, 31, 40, 75, 151])
                seq2 = "".join(rng.choices(bases, weights=[24, 24, 24, 24, 4], k=length2))
                qual2 = "".join(chr(rng.randint(33, 73)) for _ in range(length2))
                name2 = f"@R{i}:{rng.randint(1,9999)}:{seed} 2:N:0:ACGTAC"
                f2.write(f"{name2}\n{seq2}\n+\n{qual2}\n".encode())


import os


def check(oracle, tmp_path, args, outputs, fixup=None):
    ours_dir = tmp_path / "ours"
    oracle_dir = tmp_path / "oracle"
    res = oracle.run(args + ["-w", "1"], oracle_dir)
    assert res.returncode == 0, res.stderr
    run_ours(args, ours_dir)
    for name in outputs:
        d = diff_fastq(read_fastq(ours_dir / name), read_fastq(oracle_dir / name))
        assert not d, f"{name}: " + "\n".join(d)
    with open(ours_dir / "report.json") as f:
        ours_json = json.load(f)
    oracle_json = res.json_report()
    if fixup is not None:
        ours_json, oracle_json = fixup(ours_json), fixup(oracle_json)
    diffs = compare_json(ours_json, oracle_json)
    assert not diffs, "\n".join(diffs[:40])


def test_random_se_trims_filters(oracle, tmp_path):
    fq = tmp_path / "rand.fq"
    gen_fastq(fq, 4000, seed=1)
    check(oracle, tmp_path,
          ["-i", str(fq), "-o", "out.fq.gz", "-q", "-f", "2", "-t", "1",
           "-l", "-y", "-g", "-x", "--failed_out", "failed.fq.gz"],
          ["out.fq.gz", "failed.fq.gz"])


def test_random_se_cuts_adapter(oracle, tmp_path):
    fq = tmp_path / "rand.fq"
    gen_fastq(fq, 4000, seed=2)
    check(oracle, tmp_path,
          ["-i", str(fq), "-o", "out.fq.gz", "-q", "--enable_cut_front",
           "--enable_cut_tail", "-a",
           "--adapter_of_read1", "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"],
          ["out.fq.gz"])


def test_random_se_cut_right_dup(oracle, tmp_path):
    fq = tmp_path / "rand.fq"
    gen_fastq(fq, 4000, seed=3)
    check(oracle, tmp_path,
          ["-i", str(fq), "-o", "out.fq.gz", "-q", "--enable_cut_right", "-d"],
          ["out.fq.gz"])


def test_random_pe_all(oracle, tmp_path):
    fq1 = tmp_path / "rand1.fq"
    fq2 = tmp_path / "rand2.fq"
    gen_fastq(fq1, 3000, seed=4, paired_with=fq2)
    check(oracle, tmp_path,
          ["-i", str(fq1), "-I", str(fq2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-q", "-a", "-c", "-g",
           "--unpaired_read1", "up1.fq.gz", "--unpaired_read2", "up2.fq.gz",
           "--failed_out", "failed.fq.gz"],
          ["o1.fq.gz", "o2.fq.gz", "up1.fq.gz", "up2.fq.gz", "failed.fq.gz"])


def test_random_pe_merge(oracle, tmp_path):
    fq1 = tmp_path / "rand1.fq"
    fq2 = tmp_path / "rand2.fq"
    gen_fastq(fq1, 3000, seed=5, paired_with=fq2)
    check(oracle, tmp_path,
          ["-i", str(fq1), "-I", str(fq2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-m", "--merge_output", "merged.fq.gz", "-c", "-x"],
          ["o1.fq.gz", "o2.fq.gz", "merged.fq.gz"])
