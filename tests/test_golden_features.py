"""Golden tests for the long tail of features: UMI, phred64, split output,
interleaved input, ORA, index filtering, report title/paths."""

from __future__ import annotations

import gzip
import json
import shutil
from pathlib import Path

import pytest

from .oracle import TESTDATA, compare_json, diff_fastq, read_fastq
from .test_golden_se import run_ours

R1 = TESTDATA / "r1.fq.gz"
R2 = TESTDATA / "r2.fq.gz"


def check(oracle, tmp_path, args, outputs, oracle_args=None):
    ours_dir = tmp_path / "ours"
    oracle_dir = tmp_path / "oracle"
    res = oracle.run((oracle_args or args) + ["-w", "1"], oracle_dir)
    assert res.returncode == 0, res.stderr
    run_ours(args, ours_dir)
    for name in outputs:
        d = diff_fastq(read_fastq(ours_dir / name), read_fastq(oracle_dir / name))
        assert not d, f"{name}: " + "\n".join(d)
    with open(ours_dir / "report.json") as f:
        ours_json = json.load(f)
    diffs = compare_json(ours_json, res.json_report())
    assert not diffs, "\n".join(diffs[:40])


def test_umi_read1(oracle, tmp_path):
    check(oracle, tmp_path,
          ["-i", str(R1), "-o", "out.fq.gz", "-u", "--umi_location", "3",
           "--umi_length", "8"],
          ["out.fq.gz"])


def test_umi_index1_pe(oracle, tmp_path):
    check(oracle, tmp_path,
          ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-u", "--umi_location", "1"],
          ["o1.fq.gz", "o2.fq.gz"])


def test_umi_per_read_skip(oracle, tmp_path):
    check(oracle, tmp_path,
          ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-u", "--umi_location", "6", "--umi_length", "6",
           "--umi_skip_length", "2"],
          ["o1.fq.gz", "o2.fq.gz"])


def test_ora(oracle, tmp_path):
    check(oracle, tmp_path,
          ["-i", str(R1), "-o", "out.fq.gz", "-q", "--ora"],
          ["out.fq.gz"])


def test_interleaved(oracle, tmp_path):
    # build an interleaved input from r1/r2
    inter = tmp_path / "inter.fq"
    recs1 = read_fastq(R1)
    recs2 = read_fastq(R2)
    with open(inter, "wb") as f:
        for a, b in zip(recs1[:4000], recs2[:4000]):
            f.write(b"\n".join(a) + b"\n")
            f.write(b"\n".join(b) + b"\n")
    check(oracle, tmp_path,
          ["-i", str(inter), "-o", "o1.fq.gz", "--in_fq_interleaved", "-q"],
          ["o1.fq.gz"])


def test_split_by_lines(oracle, tmp_path):
    args = ["-i", str(R1), "-o", "out.fq", "-q", "-S", "--splie_file_line", "3000",
            "--max_item_in_pack", "2500"]
    ours_dir = tmp_path / "ours"
    oracle_dir = tmp_path / "oracle"
    res = oracle.run(args + ["-w", "1"], oracle_dir)
    assert res.returncode == 0, res.stderr
    run_ours(args, ours_dir)
    ours_files = sorted(p.name for p in ours_dir.glob("*.out.fq"))
    ref_files = sorted(p.name for p in oracle_dir.glob("*.out.fq"))
    assert ours_files == ref_files, (ours_files, ref_files)
    for name in ref_files:
        d = diff_fastq(read_fastq(ours_dir / name), read_fastq(oracle_dir / name))
        assert not d, f"{name}: " + "\n".join(d)


def test_split_by_file_number(oracle, tmp_path):
    args = ["-i", str(R1), "-o", "out.fq", "-q", "-s", "--split_file_number", "4",
            "--max_item_in_pack", "1000"]
    ours_dir = tmp_path / "ours"
    oracle_dir = tmp_path / "oracle"
    res = oracle.run(args + ["-w", "1"], oracle_dir)
    assert res.returncode == 0, res.stderr
    run_ours(args, ours_dir)
    ours_files = sorted(p.name for p in ours_dir.glob("*.out.fq"))
    ref_files = sorted(p.name for p in oracle_dir.glob("*.out.fq"))
    assert ours_files == ref_files, (ours_files, ref_files)
    for name in ref_files:
        d = diff_fastq(read_fastq(ours_dir / name), read_fastq(oracle_dir / name))
        assert not d, f"{name}: " + "\n".join(d)


def test_index_filter(oracle, tmp_path):
    # "TAGGTCC" @ diff<=1 also matches the dominant "TAGTTCC" index
    idx_file = tmp_path / "index1.txt"
    idx_file.write_text("TAGGTCC\n")
    check(oracle, tmp_path,
          ["-i", str(R1), "-o", "out.fq.gz", "-q", "--enable_index_filter",
           "--index1_file", str(idx_file), "--max_diff_for_match", "1"],
          ["out.fq.gz"])


def test_phred64(oracle, tmp_path):
    # synthesize a phred64-encoded input from r1
    p64 = tmp_path / "r1_p64.fq"
    recs = read_fastq(R1)[:3000]
    with open(p64, "wb") as f:
        for name, seq, strand, qual in recs:
            q64 = bytes(min(q + 31, 126) for q in qual)
            f.write(b"\n".join([name, seq, strand, q64]) + b"\n")
    check(oracle, tmp_path,
          ["-i", str(p64), "-o", "out.fq.gz", "-q", "--phred64"],
          ["out.fq.gz"])


def test_max_len_and_avg_qual(oracle, tmp_path):
    check(oracle, tmp_path,
          ["-i", str(R1), "-o", "out.fq.gz", "-q", "-b", "100", "-e", "25"],
          ["out.fq.gz"])


def test_dup_keylen_13(oracle, tmp_path):
    check(oracle, tmp_path,
          ["-i", str(R1), "-o", "out.fq.gz", "-q", "-d",
           "--dup_ana_key_len", "13", "--dup_ana_hist_size", "50"],
          ["out.fq.gz"])


def test_umi_index2_and_per_index(oracle, tmp_path):
    check(oracle, tmp_path,
          ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-u", "--umi_location", "2"],
          ["o1.fq.gz", "o2.fq.gz"])
    check(oracle, tmp_path / "p5",
          ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-u", "--umi_location", "5", "--umi_drop_comment"],
          ["o1.fq.gz", "o2.fq.gz"])


def test_umi_read2_no_trim(oracle, tmp_path):
    check(oracle, tmp_path,
          ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-u", "--umi_location", "4", "--umi_length", "5", "--umi_not_trim"],
          ["o1.fq.gz", "o2.fq.gz"])


def test_split_digits(oracle, tmp_path):
    args = ["-i", str(R1), "-o", "out.fq", "-q", "-S", "--splie_file_line",
            "4000", "--max_item_in_pack", "4000", "--digits_file_name", "2"]
    ours_dir = tmp_path / "ours"
    oracle_dir = tmp_path / "oracle"
    res = oracle.run(args + ["-w", "1"], oracle_dir)
    assert res.returncode == 0, res.stderr
    run_ours(args, ours_dir)
    ours_files = sorted(p.name for p in ours_dir.glob("*.out.fq"))
    ref_files = sorted(p.name for p in oracle_dir.glob("*.out.fq"))
    assert ours_files == ref_files and ours_files, (ours_files, ref_files)
    for name in ref_files:
        d = diff_fastq(read_fastq(ours_dir / name), read_fastq(oracle_dir / name))
        assert not d, f"{name}: " + "\n".join(d)


def test_index_filter_pe_with_correction(oracle, tmp_path):
    # index-filtered pairs must be skipped BEFORE correction, so they cannot
    # contribute to the correction counters (peprocessor.cpp:283-286)
    idx_file = tmp_path / "index1.txt"
    # "TAGGTCC" @ diff<=1 also matches the dominant "TAGTTCC" index, so most
    # pairs get filtered -- their would-be corrections must not be counted
    idx_file.write_text("TAGGTCC\n")
    check(oracle, tmp_path,
          ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-c", "--enable_index_filter", "--index1_file", str(idx_file),
           "--max_diff_for_match", "1"],
          ["o1.fq.gz", "o2.fq.gz"])


def test_index_filter_pe_blacklist2(oracle, tmp_path):
    # blacklist2 is matched against r2's firstIndex (filter.cpp:222-231)
    idx_file = tmp_path / "index2.txt"
    idx_file.write_text("TAGTTCA\n")
    check(oracle, tmp_path,
          ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-q", "--enable_index_filter", "--index2_file", str(idx_file),
           "--max_diff_for_match", "0"],
          ["o1.fq.gz", "o2.fq.gz"])


def test_phred64_pe(oracle, tmp_path):
    # synthesize phred64-encoded PE inputs from the first 2000 pairs
    paths = []
    for src, name in ((R1, "r1_p64.fq"), (R2, "r2_p64.fq")):
        p = tmp_path / name
        recs = read_fastq(src)[:2000]
        with open(p, "wb") as f:
            for rname, seq, strand, qual in recs:
                q64 = bytes(min(q + 31, 126) for q in qual)
                f.write(b"\n".join([rname, seq, strand, q64]) + b"\n")
        paths.append(p)
    check(oracle, tmp_path,
          ["-i", str(paths[0]), "-I", str(paths[1]), "-o", "o1.fq.gz",
           "-O", "o2.fq.gz", "-q", "--phred64", "-c", "-m",
           "--merge_output", "m.fq.gz"],
          ["o1.fq.gz", "o2.fq.gz", "m.fq.gz"])


class _StdinFromFile:
    """Substitute sys.stdin whose .buffer reads a caller-managed handle."""

    def __init__(self, fh):
        self.buffer = fh


def test_stdin_input_plain(oracle, tmp_path, monkeypatch):
    # The reference shares the stdin FILE* between the evaluator pre-pass
    # and the processor (fqreader.cpp:51-53) and segfaults on -i /dev/stdin;
    # we spool stdin to a temp file instead (main._spool_stdin), so output
    # must equal the oracle run on the equivalent named file.
    import sys as _sys

    plain = tmp_path / "in.fq"
    with gzip.open(R1, "rb") as f:
        plain.write_bytes(f.read())

    oracle_dir = tmp_path / "oracle"
    res = oracle.run(["-i", str(plain), "-o", "out.fq", "-q", "-w", "1"],
                     oracle_dir)
    assert res.returncode == 0, res.stderr

    ours_dir = tmp_path / "ours"
    with open(plain, "rb") as fh:
        monkeypatch.setattr(_sys, "stdin", _StdinFromFile(fh))
        run_ours(["-i", "/dev/stdin", "-o", "out.fq", "-q"], ours_dir)
    d = diff_fastq(read_fastq(ours_dir / "out.fq"),
                   read_fastq(oracle_dir / "out.fq"))
    assert not d, "\n".join(d)


def test_stdin_both_inputs_rejected(tmp_path, monkeypatch):
    # one stream cannot carry both reads of a pair: -i and -I both
    # /dev/stdin must fail cleanly (exit 255) without touching stdin
    import io
    import sys as _sys

    from fqtool_tpu.main import main

    monkeypatch.setattr(_sys, "stdin", _StdinFromFile(io.BytesIO(b"")))
    monkeypatch.chdir(tmp_path)
    rc = main(["-i", "/dev/stdin", "-I", "/dev/stdin",
               "-o", "o1.fq", "-O", "o2.fq"])
    assert rc == 255


def test_stdin_input_gzip_sniffed(oracle, tmp_path, monkeypatch):
    # gzip on stdin is detected from the magic bytes (the reference decides
    # by filename suffix, so gzip-on-stdin is impossible there)
    import sys as _sys

    oracle_dir = tmp_path / "oracle"
    res = oracle.run(["-i", str(R1), "-o", "out.fq", "-q", "-w", "1"],
                     oracle_dir)
    assert res.returncode == 0, res.stderr

    ours_dir = tmp_path / "ours"
    with open(R1, "rb") as fh:
        monkeypatch.setattr(_sys, "stdin", _StdinFromFile(fh))
        run_ours(["-i", "/dev/stdin", "-o", "out.fq", "-q"], ours_dir)
    d = diff_fastq(read_fastq(ours_dir / "out.fq"),
                   read_fastq(oracle_dir / "out.fq"))
    assert not d, "\n".join(d)


def test_worker_threads_output_invariant(tmp_path):
    # -w sizes the shared host pool (deflate/format/encode,
    # io/fastq.py::set_worker_threads); output bytes must not depend on it.
    # Subprocesses because the pool is process-wide and sized once.
    import os
    import subprocess
    import sys as _sys

    root = str(Path(__file__).resolve().parents[1])
    outs = []
    for w in ("1", "6"):
        d = tmp_path / f"w{w}"
        d.mkdir()
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""))
        r = subprocess.run(
            [_sys.executable, "-m", "fqtool_tpu.main", "-i", str(R1),
             "-o", "out.fq.gz", "-q", "-w", w, "-z", "6"],
            cwd=d, env=env, capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        outs.append((d / "out.fq.gz").read_bytes())
    assert outs[0] == outs[1], "-w changed output bytes"


def test_packed5_transport_output_invariant(tmp_path):
    # the opt-in 5-bit dictionary transport (FQTOOL_TPU_PACKED5=1) must not
    # change any output byte vs the default transport
    import os
    import subprocess
    import sys as _sys

    root = str(Path(__file__).resolve().parents[1])
    R2 = TESTDATA / "r2.fq.gz"
    outs = []
    for b5 in ("0", "1"):
        d = tmp_path / f"b5_{b5}"
        d.mkdir()
        env = dict(os.environ, JAX_PLATFORMS="cpu", FQTOOL_TPU_PACKED="1",
                   FQTOOL_TPU_PACKED5=b5,
                   PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""))
        r = subprocess.run(
            [_sys.executable, "-m", "fqtool_tpu.main", "-i", str(R1),
             "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
             "-q", "-m", "--merge_output", "m.fq.gz", "-c"],
            cwd=d, env=env, capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        outs.append(tuple((d / f).read_bytes()
                          for f in ("o1.fq.gz", "o2.fq.gz", "m.fq.gz")))
    assert outs[0] == outs[1], "PACKED5 changed output bytes"


def test_buffer_and_dead_flags_output_invariant(oracle, tmp_path):
    # --max_packs_in_repo/--max_packs_in_mem tune ring sizes in the
    # reference (options.h:15-24) and never change output; -W/-M parse but
    # never propagate (quirk: main.cpp defines them, options.update ignores
    # them).  All four must be accepted and output-invariant, matching the
    # oracle run with the same flags.
    args_plain = ["-i", str(R1), "-o", "out.fq.gz", "-q", "--enable_cut_front", "--enable_cut_tail"]
    extra = ["--max_packs_in_repo", "5", "--max_packs_in_mem", "3",
             "-W", "10", "-M", "30"]
    base_dir = tmp_path / "base"
    run_ours(args_plain, base_dir)
    check(oracle, tmp_path, args_plain + extra, ["out.fq.gz"])
    d = diff_fastq(read_fastq(base_dir / "out.fq.gz"),
                   read_fastq(tmp_path / "ours" / "out.fq.gz"))
    assert not d, "\n".join(d)
