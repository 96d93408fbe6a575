"""End-to-end golden test with data-parallel execution over the virtual
8-device mesh: the full CLI must produce byte-identical output to the oracle
with the pipeline sharded across devices."""

from __future__ import annotations

import json

import pytest

from .oracle import TESTDATA, compare_json, diff_fastq, read_fastq
from .test_golden_se import run_ours

R1 = TESTDATA / "r1.fq.gz"
R2 = TESTDATA / "r2.fq.gz"


@pytest.fixture
def fresh_calls():
    """Reset pipeline-call meshes afterwards so other tests stay single-dev."""
    yield
    from fqtool_tpu.pipeline.pe import pe_packed_call, pe_pipeline_call
    from fqtool_tpu.pipeline.se import se_packed_call, se_pipeline_call
    for call in (se_pipeline_call, pe_pipeline_call, se_packed_call,
                 pe_packed_call):
        call.set_mesh(None)


def _check(oracle, tmp_path, args, outputs):
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


def test_se_sharded_end_to_end(oracle, tmp_path, monkeypatch, fresh_calls):
    import jax

    assert len(jax.devices()) >= 8
    monkeypatch.setenv("FQTOOL_TPU_SHARD", "1")
    _check(oracle, tmp_path,
           ["-i", str(R1), "-o", "out.fq.gz", "-q", "-f", "3", "-t", "2", "-g"],
           ["out.fq.gz"])


def test_pe_sharded_end_to_end(oracle, tmp_path, monkeypatch, fresh_calls):
    import jax

    assert len(jax.devices()) >= 8
    monkeypatch.setenv("FQTOOL_TPU_SHARD", "1")
    _check(oracle, tmp_path,
           ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
            "-q", "-a", "--detect_pe_adapter"],
           ["o1.fq.gz", "o2.fq.gz"])


def test_pe_sharded_merge_correction(oracle, tmp_path, monkeypatch, fresh_calls):
    """Stateful PE paths under sharding: insert-size histogram, correction
    patches, merged-stream routing."""
    import jax

    assert len(jax.devices()) >= 8
    monkeypatch.setenv("FQTOOL_TPU_SHARD", "1")
    _check(oracle, tmp_path,
           ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
            "-m", "--merge_output", "merged.fq.gz", "-c"],
           ["o1.fq.gz", "o2.fq.gz", "merged.fq.gz"])


def test_se_sharded_umi_dup(oracle, tmp_path, monkeypatch, fresh_calls):
    """UMI relocation + duplication combiner under sharding (per-read host
    prep feeding a sharded device pipeline)."""
    import jax

    assert len(jax.devices()) >= 8
    monkeypatch.setenv("FQTOOL_TPU_SHARD", "1")
    _check(oracle, tmp_path,
           ["-i", str(R1), "-o", "out.fq.gz", "-q", "-d", "-u",
            "--umi_location", "3", "--umi_length", "6"],
           ["out.fq.gz"])
