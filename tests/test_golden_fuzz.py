"""Randomized flag-combination fuzzing: deterministic PRNG assembles valid
flag sets from a pool (respecting the reference CLI's needs/excludes), runs
the full CLI on adversarial synthetic FASTQ, and diffs output + JSON against
the reference binary (reference constraint graph: src/main.cpp:18-120)."""

from __future__ import annotations

import random

import pytest

from .test_golden_random import check as _check, gen_fastq


def check(oracle, tmp_path, args, outputs):
    """check() wrapper masking the reference's SE dup-histogram bug: the
    oracle half-memsets its size_t histogram with sizeof(int)
    (seprocessor.cpp:245), so slots >= histSize/2 carry heap garbage in SE
    runs.  We intentionally do not reproduce that (PARITY.md), so those
    slots are dropped from both reports before comparison."""
    se = "-I" not in args and "--in_fq_interleaved" not in args
    if se and "-d" in args:
        hist = 32
        if "--dup_ana_hist_size" in args:
            hist = int(args[args.index("--dup_ana_hist_size") + 1])
        _check(oracle, tmp_path, args, outputs,
               fixup=lambda j: _trim_dup_hist(j, hist // 2))
    else:
        _check(oracle, tmp_path, args, outputs)


def _trim_dup_hist(j, keep):
    dup = j.get("Duplication")
    if isinstance(dup, dict) and isinstance(dup.get("Histogram"), list):
        dup["Histogram"] = dup["Histogram"][:keep]
    return j

# (group name, argv builder(rng)) -- SE-safe groups
SE_GROUPS = [
    ("qual", lambda r: ["-q", "-Q", str(r.randint(10, 32)),
                        "-N", str(r.randint(0, 9))]
     + (["-e", str(r.randint(5, 30))] if r.random() < 0.5 else [])),
    ("length", lambda r: ["-l", "--min_length", str(r.randint(1, 40))]
     + (["--max_length", str(r.randint(80, 200))] if r.random() < 0.5 else [])),
    ("complexity", lambda r: ["-y", "-Y", str(r.choice([0, 1]))]),
    ("trims", lambda r: ["-f", str(r.randint(0, 8)), "-t", str(r.randint(0, 8)),
                         "-b", str(r.choice([0, 60, 100, 140]))]),
    ("cut_front", lambda r: ["--enable_cut_front",
                             "--cut_front_window", str(r.randint(1, 12)),
                             "--cut_front_mean_qual", str(r.randint(5, 33))]),
    ("cut_tail", lambda r: ["--enable_cut_tail",
                            "--cut_tail_window", str(r.randint(1, 12)),
                            "--cut_tail_mean_qual", str(r.randint(5, 33))]),
    # NOTE: --cut_right_mean_qual requires --enable_cut_tail in the
    # reference CLI (main.cpp typo'd constraint; mirrored by our CLI)
    ("cut_right", lambda r: ["--enable_cut_right",
                             "--cut_right_window", str(r.randint(1, 12))]
     + (["--enable_cut_tail", "--cut_right_mean_qual", str(r.randint(5, 33))]
        if r.random() < 0.5 else [])),
    ("polyg", lambda r: ["-g", "--min_len_detect_polyG", str(r.randint(3, 15)),
                         "--max_mismatches_polyG", str(r.randint(0, 4)),
                         "--one_mismatch_each_polyG", str(r.randint(2, 12))]),
    ("polyx", lambda r: ["-x", "--base_to_trim", r.choice(["G", "AT", "ATCGN", "CN"]),
                         "--min_len_detect_polyX", str(r.randint(3, 15))]),
    ("adapter", lambda r: ["-a", "--adapter_of_read1",
                           "".join(r.choices("ACGT", k=r.choice([6, 9, 13, 20, 33])))]),
    ("dup", lambda r: ["-d", "--dup_ana_key_len", str(r.choice([12, 13, 14])),
                       "--dup_ana_hist_size", str(r.choice([4, 16, 32]))]),
    ("kmer", lambda r: ["--kmer", "--kmer_length", str(r.randint(4, 7))]),
    ("umi", lambda r: ["-u", "--umi_location", str(r.choice([3, 6])),
                       "--umi_length", str(r.randint(2, 10))]
     + (["--umi_skip_length", str(r.randint(0, 3))] if r.random() < 0.5 else [])
     + (["--umi_not_trim"] if r.random() < 0.3 else [])),
]

PE_EXTRA = [
    ("trims2", lambda r: ["-F", str(r.randint(0, 8)), "-T", str(r.randint(0, 8)),
                          "-B", str(r.choice([0, 70, 120]))]),
    ("correction", lambda r: ["-c", "--min_overlap_len", str(r.randint(5, 40)),
                              "--max_diff_for_overlap", str(r.randint(0, 8))]),
    ("adapter2", lambda r: ["-a", "--adapter_of_read2",
                            "".join(r.choices("ACGT", k=r.choice([8, 16, 33])))]),
]


def build_args(rng: random.Random, groups, k: int):
    chosen = rng.sample(groups, k=min(k, len(groups)))
    argv, seen = [], set()
    for name, builder in chosen:
        frag = builder(rng)
        # '-a' may appear in both adapter groups; CLI rejects duplicates
        if frag and frag[0] == "-a" and "-a" in seen:
            frag = frag[1:]
        seen.update(f for f in frag if f.startswith("-"))
        argv += frag
    return argv


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_fuzz_se(oracle, tmp_path, seed):
    rng = random.Random(seed)
    fq = tmp_path / "in.fq"
    gen_fastq(fq, 900, seed)
    argv = ["-i", str(fq), "-o", "out.fq.gz", "--failed_out", "failed.fq.gz"]
    argv += build_args(rng, SE_GROUPS, rng.randint(3, 6))
    check(oracle, tmp_path, argv, ["out.fq.gz", "failed.fq.gz"])


@pytest.mark.parametrize("seed", [111, 222, 333, 444])
def test_fuzz_pe(oracle, tmp_path, seed):
    rng = random.Random(seed)
    fq1, fq2 = tmp_path / "in1.fq", tmp_path / "in2.fq"
    gen_fastq(fq1, 700, seed, paired_with=fq2)
    argv = ["-i", str(fq1), "-I", str(fq2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
            "--failed_out", "failed.fq.gz"]
    outputs = ["o1.fq.gz", "o2.fq.gz", "failed.fq.gz"]
    if rng.random() < 0.4:
        argv += ["-m", "--merge_output", "merged.fq.gz"]
        if rng.random() < 0.3:
            argv += ["--discard_unmerged"]
        # o1/o2 stay in the comparison: merge mode must leave them with the
        # reference's (empty) content, not silently diverge
        outputs = ["merged.fq.gz", "failed.fq.gz", "o1.fq.gz", "o2.fq.gz"]
    else:
        argv += ["--unpaired_read1", "up1.fq.gz", "--unpaired_read2", "up2.fq.gz"]
        outputs += ["up1.fq.gz", "up2.fq.gz"]
    argv += build_args(rng, SE_GROUPS + PE_EXTRA, rng.randint(3, 7))
    check(oracle, tmp_path, argv, outputs)
