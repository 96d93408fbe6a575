"""Config-matrix golden tests: a broad sweep of flag combinations on a small
adversarial input, each diffed record-for-record against the reference."""

from __future__ import annotations

import json
import random

import pytest

from .oracle import compare_json, diff_fastq, read_fastq
from .test_golden_se import run_ours


@pytest.fixture(scope="module")
def small_input(tmp_path_factory):
    d = tmp_path_factory.mktemp("matrix")
    rng = random.Random(99)
    fq1, fq2 = d / "m1.fq", d / "m2.fq"
    with open(fq1, "wb") as f1, open(fq2, "wb") as f2:
        for i in range(1500):
            for rnum, f in ((1, f1), (2, f2)):
                n = rng.choice([8, 20, 35, 64, 100, 151])
                seq = "".join(rng.choices("ACGTN", weights=[24, 24, 24, 24, 3], k=n))
                if rng.random() < 0.12 and n > 30:
                    t = rng.randint(10, 25)
                    seq = seq[:-t] + rng.choice("GATC") * t
                qual = "".join(chr(rng.randint(33, 73)) for _ in range(n))
                f.write(f"@M{i}:77:FC:1:1:{i}:{i} {rnum}:N:0:ACGT+TGCA\n"
                        f"{seq}\n+\n{qual}\n".encode())
    return fq1, fq2


SE_CONFIGS = [
    ["-q", "-Q", "25", "-U", "0.3", "-N", "2"],
    ["-q", "-e", "30"],
    ["-l", "--min_length", "30", "--max_length", "120"],
    ["-y", "-Y", "0.5"],
    ["-x", "--base_to_trim", "GT", "--min_len_detect_polyX", "6"],
    ["-g", "--min_len_detect_polyG", "5", "--max_mismatches_polyG", "3",
     "--one_mismatch_each_polyG", "4"],
    ["-f", "7", "-t", "9", "-b", "80"],
    ["--enable_cut_front", "--cut_front_window", "7", "--cut_front_mean_qual", "25"],
    ["--enable_cut_tail", "--cut_tail_window", "2", "--cut_tail_mean_qual", "30"],
    ["--enable_cut_right", "--enable_cut_tail", "--cut_right_window", "10",
     "--cut_right_mean_qual", "18"],
    ["-a", "--adapter_of_read1", "ACGTACGTAC"],  # short adapter, start=-2 rule
    ["-a", "--adapter_of_read1", "ACGTACGTACGT"],  # 12bp, start=-3 rule
    ["-q", "-d", "--dup_ana_hist_size", "8"],
]

PE_CONFIGS = [
    ["-q", "-c"],
    ["-a", "--adapter_of_read1", "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA",
     "--adapter_of_read2", "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT"],
    ["-c", "--min_overlap_len", "12", "--max_diff_for_overlap", "2"],
    ["-F", "4", "-T", "6", "-B", "90", "-q"],
    ["-m", "--merge_output", "mg.fq", "--min_overlap_len", "20"],
]


@pytest.mark.parametrize("cfg", SE_CONFIGS, ids=lambda c: " ".join(c))
def test_matrix_se(oracle, tmp_path, small_input, cfg):
    fq1, _ = small_input
    args = ["-i", str(fq1), "-o", "out.fq", *cfg]
    res = oracle.run(args + ["-w", "1"], tmp_path / "oracle")
    assert res.returncode == 0, res.stderr
    run_ours(args, tmp_path / "ours")
    d = diff_fastq(read_fastq(tmp_path / "ours" / "out.fq"),
                   read_fastq(tmp_path / "oracle" / "out.fq"))
    assert not d, "\n".join(d)
    with open(tmp_path / "ours" / "report.json") as f:
        diffs = compare_json(json.load(f), res.json_report())
    assert not diffs, "\n".join(diffs[:40])


@pytest.mark.parametrize("cfg", PE_CONFIGS, ids=lambda c: " ".join(c))
def test_matrix_pe(oracle, tmp_path, small_input, cfg):
    fq1, fq2 = small_input
    args = ["-i", str(fq1), "-I", str(fq2), "-o", "o1.fq", "-O", "o2.fq", *cfg]
    res = oracle.run(args + ["-w", "1"], tmp_path / "oracle")
    assert res.returncode == 0, res.stderr
    run_ours(args, tmp_path / "ours")
    outputs = ["o1.fq", "o2.fq"] + (["mg.fq"] if "-m" in cfg else [])
    for name in outputs:
        d = diff_fastq(read_fastq(tmp_path / "ours" / name),
                       read_fastq(tmp_path / "oracle" / name))
        assert not d, f"{name}: " + "\n".join(d)
    with open(tmp_path / "ours" / "report.json") as f:
        diffs = compare_json(json.load(f), res.json_report())
    assert not diffs, "\n".join(diffs[:40])
