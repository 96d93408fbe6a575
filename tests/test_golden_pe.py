"""Golden tests: PE pipeline vs the reference binary (single worker thread)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from .oracle import TESTDATA, compare_json, diff_fastq, read_fastq
from .test_golden_se import run_ours

R1 = TESTDATA / "r1.fq.gz"
R2 = TESTDATA / "r2.fq.gz"
PG1 = TESTDATA / "polygr1.fq"
PG2 = TESTDATA / "polygr2.fq"


def check_config(oracle, tmp_path: Path, args, outputs):
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
    diffs = compare_json(ours_json, res.json_report())
    assert not diffs, "\n".join(diffs[:40])


def pe_args(*extra):
    return ["-i", str(R1), "-I", str(R2), "-o", "out1.fq.gz", "-O", "out2.fq.gz",
            *extra]


def test_pe_default(oracle, tmp_path):
    check_config(oracle, tmp_path, pe_args(), ["out1.fq.gz", "out2.fq.gz"])


def test_pe_quality_filter(oracle, tmp_path):
    check_config(oracle, tmp_path, pe_args("-q", "-f", "3", "-T", "2"),
                 ["out1.fq.gz", "out2.fq.gz"])


def test_pe_adapter_trim(oracle, tmp_path):
    """-a with PE: overlap-analysis trimming + detection pre-pass."""
    check_config(oracle, tmp_path, pe_args("-a", "--detect_pe_adapter"),
                 ["out1.fq.gz", "out2.fq.gz"])


def test_pe_merge_correction(oracle, tmp_path):
    """Driver config 4: -m --merge_output -c."""
    check_config(oracle, tmp_path,
                 pe_args("-m", "--merge_output", "merged.fq.gz", "-c"),
                 ["out1.fq.gz", "out2.fq.gz", "merged.fq.gz"])


def test_pe_full(oracle, tmp_path):
    """Driver config 5 (README smoke test)."""
    check_config(oracle, tmp_path,
                 pe_args("-q", "--kmer", "--kmer_length", "6", "-d", "-a",
                         "--detect_pe_adapter"),
                 ["out1.fq.gz", "out2.fq.gz"])


def test_pe_unpaired_failed(oracle, tmp_path):
    check_config(oracle, tmp_path,
                 pe_args("-q", "--enable_cut_right",
                         "--unpaired_read1", "up1.fq.gz",
                         "--unpaired_read2", "up2.fq.gz",
                         "--failed_out", "failed.fq.gz"),
                 ["out1.fq.gz", "out2.fq.gz", "up1.fq.gz", "up2.fq.gz", "failed.fq.gz"])


def test_pe_polyg(oracle, tmp_path):
    check_config(oracle, tmp_path,
                 ["-i", str(PG1), "-I", str(PG2), "-o", "o1.fq", "-O", "o2.fq", "-g"],
                 ["o1.fq", "o2.fq"])
