"""End-to-end goldens for the env-gated transport paths: packed seq+qual
transport (FQTOOL_TPU_PACKED=1) and cross-pack overlap dispatch
(FQTOOL_TPU_PACK_OVERLAP=1) must keep output byte-identical."""

from __future__ import annotations

import json

from .oracle import TESTDATA, compare_json, diff_fastq, read_fastq
from .test_golden_se import run_ours

R1 = TESTDATA / "r1.fq.gz"
R2 = TESTDATA / "r2.fq.gz"


def _check(oracle, tmp_path, args, outputs):
    res = oracle.run(args + ["-w", "1"], tmp_path / "oracle")
    assert res.returncode == 0, res.stderr
    run_ours(args, tmp_path / "ours")
    for name in outputs:
        d = diff_fastq(read_fastq(tmp_path / "ours" / name),
                       read_fastq(tmp_path / "oracle" / name))
        assert not d, f"{name}: " + "\n".join(d)
    with open(tmp_path / "ours" / "report.json") as f:
        ours_json = json.load(f)
    diffs = compare_json(ours_json, res.json_report())
    assert not diffs, "\n".join(diffs[:40])


def test_packed_transport_se(oracle, tmp_path, monkeypatch):
    monkeypatch.setenv("FQTOOL_TPU_PACKED", "1")
    _check(oracle, tmp_path,
           ["-i", str(R1), "-o", "out.fq.gz", "-q", "-f", "3", "-t", "2",
            "-d", "--failed_out", "failed.fq.gz"],
           ["out.fq.gz", "failed.fq.gz"])


def test_packed_transport_pe_merge(oracle, tmp_path, monkeypatch):
    monkeypatch.setenv("FQTOOL_TPU_PACKED", "1")
    _check(oracle, tmp_path,
           ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
            "-m", "--merge_output", "merged.fq.gz", "-c"],
           ["o1.fq.gz", "o2.fq.gz", "merged.fq.gz"])


def test_pack_overlap_se(oracle, tmp_path, monkeypatch):
    monkeypatch.setenv("FQTOOL_TPU_PACK_OVERLAP", "1")
    monkeypatch.setenv("FQTOOL_TPU_SE_CHUNK", "2048")  # several packs
    _check(oracle, tmp_path,
           ["-i", str(R1), "-o", "out.fq.gz", "-q", "-d"],
           ["out.fq.gz"])


def test_pack_overlap_pe(oracle, tmp_path, monkeypatch):
    monkeypatch.setenv("FQTOOL_TPU_PACK_OVERLAP", "1")
    monkeypatch.setenv("FQTOOL_TPU_PE_CHUNK", "1024")
    monkeypatch.setenv("FQTOOL_TPU_PE_PACK_CHUNKS", "2")
    _check(oracle, tmp_path,
           ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
            "-q", "-d", "-c", "-a", "--detect_pe_adapter"],
           ["o1.fq.gz", "o2.fq.gz"])
