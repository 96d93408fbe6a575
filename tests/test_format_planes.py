"""format_plane_array_records: native plane formatter vs pure-Python
fallback, and vs the equivalent interleaved-matrix formulation."""

import numpy as np

from fqtool_tpu.io import fastq, native


def _mk(rng, n, w):
    s = rng.integers(65, 91, size=(n, w), dtype=np.uint8)
    q = rng.integers(33, 74, size=(n, w), dtype=np.uint8)
    return s, q


def test_native_matches_python_fallback(monkeypatch):
    rng = np.random.default_rng(7)
    n = 57
    planes = [_mk(rng, n, 30), _mk(rng, n, 20), _mk(rng, n, 25)]
    k = 3 * n
    plane_id = np.tile(np.arange(3, dtype=np.uint8), n)
    row_idx = np.repeat(np.arange(n, dtype=np.int32), 3)
    sel = rng.random(k) < 0.6
    start = rng.integers(0, 5, size=k).astype(np.int32)
    out_len = rng.integers(0, 15, size=k).astype(np.int32)
    names = [b"r%04d" % i for i in range(k)]
    nb = b"".join(names)
    nl = np.array([len(x) for x in names], np.int32)
    no = np.zeros(k, np.int64)
    np.cumsum(nl[:-1], out=no[1:])
    sb = b"+" * k
    so = np.arange(k, dtype=np.int64)
    sl = np.ones(k, np.int32)
    tagbuf = b"failed_tagother"
    tag_off = rng.integers(0, 2, size=k).astype(np.int64) * 10
    tag_len = rng.integers(0, 6, size=k).astype(np.int32)

    assert native.get_lib() is not None
    got_native = fastq.format_plane_array_records(
        sel, nb, no, nl, sb, so, sl, planes, plane_id, row_idx,
        start, out_len, tags=(tagbuf, tag_off, tag_len))
    monkeypatch.setattr(native, "get_lib", lambda: None)
    got_py = fastq.format_plane_array_records(
        sel, nb, no, nl, sb, so, sl, planes, plane_id, row_idx,
        start, out_len, tags=(tagbuf, tag_off, tag_len))
    assert got_native == got_py
    # spot-check one record's structure
    lines = got_native.split(b"\n")
    assert len(lines) == 4 * int(sel.sum()) + 1  # trailing newline

    # equivalence with the interleaved-matrix formulation
    W = max(p[0].shape[1] for p in planes)
    int_s = np.zeros((k, W), np.uint8)
    int_q = np.zeros((k, W), np.uint8)
    for p, (ps, pq) in enumerate(planes):
        int_s[p::3, : ps.shape[1]] = ps
        int_q[p::3, : pq.shape[1]] = pq
    got_int = fastq.format_array_records(
        sel, nb, no, nl, sb, so, sl, int_s, int_q, start, out_len,
        tags=(tagbuf, tag_off, tag_len))
    assert got_native == got_int


def test_two_planes_no_tags():
    rng = np.random.default_rng(11)
    n = 31
    planes = [_mk(rng, n, 12), _mk(rng, n, 16)]
    k = 2 * n
    plane_id = np.tile(np.arange(2, dtype=np.uint8), n)
    row_idx = np.repeat(np.arange(n, dtype=np.int32), 2)
    sel = np.ones(k, bool)
    start = np.zeros(k, np.int32)
    out_len = np.full(k, 10, np.int32)
    nb = b"x" * k
    no = np.arange(k, dtype=np.int64)
    nl = np.ones(k, np.int32)
    sb = b"+" * k
    so = np.arange(k, dtype=np.int64)
    sl = np.ones(k, np.int32)
    got = fastq.format_plane_array_records(
        sel, nb, no, nl, sb, so, sl, planes, plane_id, row_idx,
        start, out_len)
    recs = got.split(b"\n")
    assert len(recs) == 4 * k + 1
    # row 0 comes from plane 0 row 0, row 1 from plane 1 row 0
    assert recs[1] == planes[0][0][0, :10].tobytes()
    assert recs[5] == planes[1][0][0, :10].tobytes()
