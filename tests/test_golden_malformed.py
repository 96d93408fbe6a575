"""Malformed-input golden tests: the reference stops the stream on a
quality/sequence length mismatch (fqreader.cpp:184-191) and skips blank or
non-'@' garbage lines while scanning for record starts."""

from __future__ import annotations

import json
from pathlib import Path

from .oracle import TESTDATA, compare_json, diff_fastq, read_fastq
from .test_golden_se import run_ours

R1 = TESTDATA / "r1.fq.gz"


def check(oracle, tmp_path, args, outputs):
    ours_dir = tmp_path / "ours"
    oracle_dir = tmp_path / "oracle"
    res = oracle.run(args + ["-w", "1"], oracle_dir)
    run_ours(args, ours_dir)
    for name in outputs:
        d = diff_fastq(read_fastq(ours_dir / name), read_fastq(oracle_dir / name))
        assert not d, f"{name}: " + "\n".join(d)
    with open(ours_dir / "report.json") as f:
        ours_json = json.load(f)
    diffs = compare_json(ours_json, res.json_report())
    assert not diffs, "\n".join(diffs[:40])


def test_qual_length_mismatch_stops_stream(oracle, tmp_path):
    recs = read_fastq(R1)[:3000]
    fq = tmp_path / "bad.fq"
    with open(fq, "wb") as f:
        for i, (name, seq, strand, qual) in enumerate(recs):
            if i == 1500:
                qual = qual[:-5]  # truncated quality line
            f.write(b"\n".join([name, seq, strand, qual]) + b"\n")
    check(oracle, tmp_path, ["-i", str(fq), "-o", "out.fq.gz", "-q"],
          ["out.fq.gz"])


def test_garbage_lines_between_records(oracle, tmp_path):
    recs = read_fastq(R1)[:2000]
    fq = tmp_path / "garbage.fq"
    with open(fq, "wb") as f:
        for i, rec in enumerate(recs):
            if i % 500 == 250:
                f.write(b"\n")          # blank line
                f.write(b"# stray comment line\n")
            f.write(b"\n".join(rec) + b"\n")
    check(oracle, tmp_path, ["-i", str(fq), "-o", "out.fq.gz", "-q"],
          ["out.fq.gz"])


def test_corrupt_gzip_clean_error(tmp_path):
    """Corrupt gzip body: the reference prints "Error to read gzip file" and
    then segfaults on the dead stream (not reproduced); we print the same
    message and exit 255 cleanly, on both codec paths."""
    import subprocess, sys, os
    data = (TESTDATA / "r1.fq.gz").read_bytes()
    c = bytearray(data)
    c[5000] ^= 0xFF
    (tmp_path / "corrupt.fq.gz").write_bytes(bytes(c))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    root = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    for extra in ({}, {"FQTOOL_TPU_NO_NATIVE": "1"}):
        r = subprocess.run(
            [sys.executable, "-m", "fqtool_tpu.main", "-i", "corrupt.fq.gz",
             "-o", "out.fq.gz"],
            cwd=tmp_path, env=env | extra, capture_output=True, text=True)
        assert r.returncode == 255, r.stderr
        assert "Error to read gzip file" in r.stderr


def test_truncated_gzip_golden(oracle, tmp_path):
    """Truncated gzip member: both sides process the records that decompress
    and stop at the partial record (fqreader tolerates short reads)."""
    data = (TESTDATA / "r1.fq.gz").read_bytes()
    (tmp_path / "trunc.fq.gz").write_bytes(data[: len(data) // 2])
    check(oracle, tmp_path,
          ["-i", str(tmp_path / "trunc.fq.gz"), "-o", "out.fq.gz", "-q"],
          ["out.fq.gz"])
