"""Golden tests: SE pipeline vs the reference binary (single worker thread)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from .oracle import TESTDATA, compare_json, diff_fastq, read_fastq

R1 = TESTDATA / "r1.fq.gz"
POLYG_R1 = TESTDATA / "polygr1.fq"


def run_ours(argv, workdir: Path):
    import os

    from fqtool_tpu.main import main
    cwd = os.getcwd()
    workdir.mkdir(parents=True, exist_ok=True)
    os.chdir(workdir)
    try:
        rc = main(argv)
    finally:
        os.chdir(cwd)
    assert rc == 0, f"fqtool_tpu.main returned {rc} for {argv}"


def check_config(oracle, tmp_path: Path, args, outputs=("out.fq.gz",)):
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


def test_se_quality_filter_trims(oracle, tmp_path):
    """Driver config 1: -q -f 3 -t 2."""
    check_config(oracle, tmp_path,
                 ["-i", str(R1), "-o", "out.fq.gz", "-q", "-f", "3", "-t", "2"])


def test_se_default_flags(oracle, tmp_path):
    check_config(oracle, tmp_path, ["-i", str(R1), "-o", "out.fq.gz"])


def test_se_polyg_polyx(oracle, tmp_path):
    """Driver config 2: -g -x on the polyG fixture."""
    check_config(oracle, tmp_path,
                 ["-i", str(POLYG_R1), "-o", "out.fq", "-g", "-x"],
                 outputs=("out.fq",))


def test_se_adapter_trim(oracle, tmp_path):
    """Driver config 3: explicit adapter."""
    check_config(oracle, tmp_path,
                 ["-i", str(R1), "-o", "out.fq.gz", "-a",
                  "--adapter_of_read1", "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"])


def test_se_cut_front_tail(oracle, tmp_path):
    check_config(oracle, tmp_path,
                 ["-i", str(R1), "-o", "out.fq.gz", "-q",
                  "--enable_cut_front", "--enable_cut_tail"])


def test_se_cut_right_failed_out(oracle, tmp_path):
    check_config(oracle, tmp_path,
                 ["-i", str(R1), "-o", "out.fq.gz", "-q",
                  "--enable_cut_right", "--failed_out", "failed.fq.gz"],
                 outputs=("out.fq.gz", "failed.fq.gz"))


def test_se_length_complexity(oracle, tmp_path):
    check_config(oracle, tmp_path,
                 ["-i", str(R1), "-o", "out.fq.gz", "-q", "-l", "-y",
                  "--min_length", "100"])


def test_se_dup_kmer(oracle, tmp_path):
    check_config(oracle, tmp_path,
                 ["-i", str(R1), "-o", "out.fq.gz", "-q", "-d",
                  "--kmer", "--kmer_length", "5"])
