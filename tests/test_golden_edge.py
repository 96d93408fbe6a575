"""Edge-case golden tests: long reads, empty input, CRLF line endings,
ORA-with-merge, and tiny inputs."""

from __future__ import annotations

import json
import random
from pathlib import Path

import pytest

from .oracle import TESTDATA, compare_json, diff_fastq, read_fastq
from .test_golden_se import run_ours

R1 = TESTDATA / "r1.fq.gz"
R2 = TESTDATA / "r2.fq.gz"


def check(oracle, tmp_path, args, outputs):
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


def test_long_reads(oracle, tmp_path):
    """Reads well past the 300-cycle long-read threshold with varying length
    (exercises stats buffer growth and the quality-cut windows at scale)."""
    rng = random.Random(7)
    fq = tmp_path / "long.fq"
    with open(fq, "wb") as f:
        for i in range(600):
            n = rng.choice([350, 480, 500, 750, 1000])
            seq = "".join(rng.choices("ACGTN", weights=[24, 24, 24, 24, 2], k=n))
            qual = "".join(chr(rng.randint(33, 73)) for _ in range(n))
            f.write(f"@L{i} 1:N:0:AAAA\n{seq}\n+\n{qual}\n".encode())
    check(oracle, tmp_path,
          ["-i", str(fq), "-o", "out.fq.gz", "-q", "--enable_cut_right", "-g"],
          ["out.fq.gz"])


def test_tiny_input(oracle, tmp_path):
    fq = tmp_path / "tiny.fq"
    fq.write_bytes(b"@only_read 1:N:0:A\nACGTACGTACGTACGTAC\n+\n" + b"I" * 18 + b"\n")
    check(oracle, tmp_path,
          ["-i", str(fq), "-o", "out.fq", "-q", "-l"],
          ["out.fq"])


def test_crlf_line_endings(oracle, tmp_path):
    recs = read_fastq(R1)[:2000]
    fq = tmp_path / "crlf.fq"
    with open(fq, "wb") as f:
        for rec in recs:
            f.write(b"\r\n".join(rec) + b"\r\n")
    check(oracle, tmp_path,
          ["-i", str(fq), "-o", "out.fq.gz", "-q"],
          ["out.fq.gz"])


def test_ora_with_merge(oracle, tmp_path):
    check(oracle, tmp_path,
          ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-m", "--merge_output", "merged.fq.gz", "--ora"],
          ["merged.fq.gz"])


def test_merge_discard_unmerged(oracle, tmp_path):
    check(oracle, tmp_path,
          ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-m", "--merge_output", "merged.fq.gz", "--discard_unmerged", "-q"],
          ["merged.fq.gz", "o1.fq.gz", "o2.fq.gz"])


def test_compression_level(oracle, tmp_path):
    """-z 9 output decompresses to the same records."""
    check(oracle, tmp_path,
          ["-i", str(R1), "-o", "out.fq.gz", "-z", "9", "-q"],
          ["out.fq.gz"])


def test_pe_long_reads(oracle, tmp_path):
    """PE with reads past the long-read threshold exercises the chunk cap on
    the quadratic overlap working set."""
    rng = random.Random(21)
    fq1, fq2 = tmp_path / "l1.fq", tmp_path / "l2.fq"
    with open(fq1, "wb") as f1, open(fq2, "wb") as f2:
        for i in range(400):
            for f in (f1, f2):
                n = rng.choice([320, 400, 500])
                seq = "".join(rng.choices("ACGTN", weights=[24, 24, 24, 24, 2], k=n))
                qual = "".join(chr(rng.randint(33, 73)) for _ in range(n))
                f.write(f"@LP{i} 1:N:0:AAAA\n{seq}\n+\n{qual}\n".encode())
    check(oracle, tmp_path,
          ["-i", str(fq1), "-I", str(fq2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-q", "-c", "-a"],
          ["o1.fq.gz", "o2.fq.gz"])


def test_ora_empty_sequences(oracle, tmp_path):
    """All-empty sequence lines with ORA enabled: the window-hash context
    must handle a zero-length corpus (no over-represented seqs) on both
    codec paths."""
    import os
    fq = tmp_path / "empty_seqs.fq"
    fq.write_bytes(b"".join(b"@r%d\n\n+\n\n" % i for i in range(50)))
    check(oracle, tmp_path,
          ["-i", str(fq), "-o", "out.fq.gz", "--ora"], ["out.fq.gz"])
    os.environ["FQTOOL_TPU_NO_NATIVE"] = "1"
    try:
        d2 = tmp_path / "nonative"
        d2.mkdir()
        check(oracle, d2, ["-i", str(fq), "-o", "out.fq.gz", "--ora"],
              ["out.fq.gz"])
    finally:
        os.environ.pop("FQTOOL_TPU_NO_NATIVE", None)


def test_cr_only_line_endings(oracle, tmp_path):
    """Classic-Mac \r-only line breaks: the reference's getLine terminates at
    the FIRST of \r or \n (fqreader.cpp:95-101), so \r-separated records
    parse; our tokenizers mirror it exactly."""
    fq = tmp_path / "cr.fq"
    recs = []
    for i in range(40):
        seq = "ACGTACGTACGTACGT"[: 8 + (i % 8)]
        recs.append(f"@c{i} x\r{seq}\r+\r{'I' * len(seq)}\r")
    fq.write_bytes("".join(recs).encode())
    check(oracle, tmp_path, ["-i", str(fq), "-o", "out.fq.gz", "-q"],
          ["out.fq.gz"])


def test_blank_lines_between_records(oracle, tmp_path):
    """Empty lines inside the stream exercise the getLine newline-swallow
    quirk (one following \n is consumed with each terminator,
    fqreader.cpp:108-110) -- both sides must mis-parse identically."""
    fq = tmp_path / "blank.fq"
    parts = []
    for i in range(30):
        seq = "ACGTACGT"
        parts.append(f"@b{i}\n{seq}\n+\n{'F' * len(seq)}\n")
        if i % 3 == 0:
            parts.append("\n")  # stray blank line between records
    fq.write_bytes("".join(parts).encode())
    check(oracle, tmp_path, ["-i", str(fq), "-o", "out.fq.gz"],
          ["out.fq.gz"])


def test_pe_long_reads_merge(oracle, tmp_path):
    """Long-read PE with merge+correction: exercises the chunk-cap halving,
    the take_dyn size guard, and merged-read assembly at widths ~500 with
    genuinely overlapping pairs (r2 = revcomp of a shifted window of r1's
    template, low-qual mismatches sprinkled in for correction)."""
    rng = random.Random(33)
    comp = {"A": "T", "T": "A", "C": "G", "G": "C", "N": "N"}
    fq1, fq2 = tmp_path / "m1.fq", tmp_path / "m2.fq"
    with open(fq1, "wb") as f1, open(fq2, "wb") as f2:
        for i in range(300):
            tlen = rng.choice([550, 700, 820])
            template = "".join(rng.choices("ACGT", k=tlen))
            n1 = rng.choice([400, 480])
            n2 = rng.choice([400, 480])
            r1 = template[:n1]
            tail = template[max(0, tlen - n2):]
            r2 = "".join(comp[b] for b in reversed(tail))
            if rng.random() < 0.5 and len(r2) > 50:  # correction bait
                j = rng.randrange(20, len(r2) - 20)
                r2 = r2[:j] + rng.choice("ACGT") + r2[j + 1:]
            q1 = "".join(chr(rng.randint(55, 73)) for _ in range(len(r1)))
            q2 = list(chr(rng.randint(55, 73)) for _ in range(len(r2)))
            for k in rng.sample(range(len(r2)), 5):
                q2[k] = chr(rng.randint(33, 46))  # low-qual positions
            f1.write(f"@ML{i} 1:N:0:AAAA\n{r1}\n+\n{q1}\n".encode())
            f2.write(f"@ML{i} 2:N:0:AAAA\n{r2}\n+\n{''.join(q2)}\n".encode())
    check(oracle, tmp_path,
          ["-i", str(fq1), "-I", str(fq2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "-m", "--merge_output", "m.fq.gz", "-c"],
          ["o1.fq.gz", "o2.fq.gz", "m.fq.gz"])


def test_bench_scale_stream(oracle, tmp_path):
    """Bench-scale SE stream (400k reads = 32x-replicated r1): multi-pack
    streaming, write-unit framing and the tail-chunk bucket path all engage
    (3 full 131072-read packs + a 6784-read tail), diffed record-for-record
    against the oracle.

    The JSON comparison EXCLUDES the Duplication section: at 32 copies per
    read the duplication counts reach histSize, where the reference's
    half-memset (seprocessor.cpp:245, sizeof(int) on a uint64 array) and
    hist[count] out-of-bounds write leave heap garbage in slots 16..31
    (observed raw-pointer values like 1709375216) -- the documented
    reference bugs fqtool_tpu deliberately does not reproduce (PARITY.md);
    our histogram holds the honest clamped counts."""
    rep = tmp_path / "se400k.fq.gz"
    rep.write_bytes(R1.read_bytes() * 32)
    args = ["-i", str(rep), "-o", "out.fq.gz", "-q", "-f", "3", "-t", "2", "-d"]
    ours_dir = tmp_path / "ours"
    oracle_dir = tmp_path / "oracle"
    res = oracle.run(args + ["-w", "1"], oracle_dir)
    assert res.returncode == 0, res.stderr
    run_ours(args, ours_dir)
    d = diff_fastq(read_fastq(ours_dir / "out.fq.gz"),
                   read_fastq(oracle_dir / "out.fq.gz"))
    assert not d, "\n".join(d[:20])
    with open(ours_dir / "report.json") as f:
        ours_json = json.load(f)
    ref_json = res.json_report()
    # our histogram must hold honest counts (the clamped top slot is
    # populated; nothing resembles the oracle's heap-pointer garbage)
    hist = ours_json["Duplication"]["Histogram"]
    assert hist[-1] > 0 and all(0 <= c <= 400_000 for c in hist)
    for j in (ours_json, ref_json):
        j.pop("Duplication", None)
    diffs = compare_json(ours_json, ref_json)
    assert not diffs, "\n".join(diffs[:40])
