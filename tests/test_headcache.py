"""Head-cache (io/headcache.py): the evaluation pre-passes and the main
pass share one reader per input, so each byte is inflated/tokenized once
(beats the reference's 4-5 head re-scans, src/main.cpp:128-143).

Covers: cached pre-pass views == direct-read paths; pipeline output
byte-identical with the cache disabled; framing-mismatch fallback; cache
registry left empty after a run.
"""

from __future__ import annotations

import gzip
import os
from pathlib import Path

import numpy as np
import pytest

from .oracle import TESTDATA

R1 = str(TESTDATA / "r1.fq.gz")
R2 = str(TESTDATA / "r2.fq.gz")


@pytest.fixture(autouse=True)
def _clean_registry():
    from fqtool_tpu.io import headcache
    headcache.discard_all()
    yield
    headcache.discard_all()


def test_prepass_views_match_direct_reads():
    """read_len / matrix / seq_prefix from the cache equal the evaluator's
    direct-file code paths (which they replace when a cache is active)."""
    from fqtool_tpu.host import evaluator
    from fqtool_tpu.io import headcache

    direct_len = evaluator.compute_read_len(R1)
    direct_ors = evaluator.compute_over_rep_seq(R1)
    direct_mat, direct_lens = evaluator._load_record_matrix(
        R1, 256 * 1024, 151 * 20000)

    headcache.activate(R1, pack_reads=4096, phred64=False)
    assert headcache.get(R1) is not None
    try:
        assert evaluator.compute_read_len(R1) == direct_len
        assert evaluator.compute_over_rep_seq(R1) == direct_ors
        mat, lens = evaluator._load_record_matrix(R1, 256 * 1024, 151 * 20000)
        np.testing.assert_array_equal(lens, direct_lens)
        assert mat.shape[0] == direct_mat.shape[0]
        w = min(mat.shape[1], direct_mat.shape[1])
        np.testing.assert_array_equal(mat[:, :w], direct_mat[:, :w])
        assert not mat[:, w:].any() and not direct_mat[:, w:].any()
    finally:
        headcache.discard_all()


def test_drain_resumes_full_stream():
    """Cache pre-filled by a pre-pass, then drained by the main pass:
    the resumed pack stream equals a fresh read of the whole file."""
    from fqtool_tpu.io import headcache
    from fqtool_tpu.io.fastq import iter_packs

    direct = list(iter_packs(R1, 4096, False))

    headcache.activate(R1, pack_reads=4096, phred64=False)
    headcache.get(R1).read_len(1000)  # force a partial head fill
    resumed = list(headcache.iter_packs_cached(R1, 4096, False))
    assert headcache.get(R1) is None  # drained out of the registry

    assert len(resumed) == len(direct)
    for a, b in zip(resumed, direct):
        assert a.count == b.count
        np.testing.assert_array_equal(a.lens, b.lens)
        w = min(a.seq.shape[1], b.seq.shape[1])
        np.testing.assert_array_equal(a.seq[:, :w], b.seq[:, :w])
        np.testing.assert_array_equal(a.qual[:, :w], b.qual[:, :w])
        for i in range(a.count):
            oa, la = int(a.name_off[i]), int(a.name_len[i])
            ob, lb = int(b.name_off[i]), int(b.name_len[i])
            assert a.buf[oa:oa + la] == b.buf[ob:ob + lb]


def test_framing_mismatch_falls_back():
    """A cache registered with different pack framing is discarded and the
    stream re-read from scratch (correct content either way)."""
    from fqtool_tpu.io import headcache
    from fqtool_tpu.io.fastq import iter_packs

    headcache.activate(R1, pack_reads=100, phred64=False)
    headcache.get(R1).read_len(1000)
    got = list(headcache.iter_packs_cached(R1, 4096, False))
    direct = list(iter_packs(R1, 4096, False))
    assert headcache.get(R1) is None
    assert [p.count for p in got] == [p.count for p in direct]
    total = sum(int(p.lens.sum()) for p in got)
    assert total == sum(int(p.lens.sum()) for p in direct)


def _run_main(argv, workdir: Path):
    from fqtool_tpu.main import main
    cwd = os.getcwd()
    workdir.mkdir(parents=True, exist_ok=True)
    os.chdir(workdir)
    try:
        rc = main(argv)
    finally:
        os.chdir(cwd)
    assert rc == 0


def test_pipeline_output_invariant_to_headcache(tmp_path):
    """Full PE run (adapter detection + ORS pre-passes active) produces
    byte-identical outputs with the head cache on and off."""
    from fqtool_tpu.io import headcache

    args = ["-i", R1, "-I", R2, "-o", "o1.fq.gz", "-O", "o2.fq.gz",
            "-q", "--detect_pe_adapter", "--ora"]
    _run_main(args, tmp_path / "on")
    assert headcache.get(R1) is None and headcache.get(R2) is None

    os.environ["FQTOOL_TPU_HEADCACHE"] = "0"
    try:
        _run_main(args, tmp_path / "off")
    finally:
        del os.environ["FQTOOL_TPU_HEADCACHE"]

    for name in ("o1.fq.gz", "o2.fq.gz"):
        on = gzip.open(tmp_path / "on" / name, "rb").read()
        off = gzip.open(tmp_path / "off" / name, "rb").read()
        assert on == off, f"{name} differs with head cache enabled"
    import json
    on_json = json.loads((tmp_path / "on" / "report.json").read_text())
    off_json = json.loads((tmp_path / "off" / "report.json").read_text())
    # the Software section embeds the run directory; everything else must match
    for rep in (on_json, off_json):
        rep.pop("Software", None)
        rep.pop("fqtool-tpu", None)
    assert on_json == off_json
