"""Round-3 kernel rewrites: unit equivalence for shift_rows, the two
overlap accept-scan lowerings, and the two kmer-histogram paths."""

from __future__ import annotations

import numpy as np
import pytest


def test_shift_rows_wraps_cyclically():
    import jax.numpy as jnp

    from fqtool_tpu.ops.common import shift_rows

    rng = np.random.default_rng(0)
    B, L = 37, 23
    x = rng.integers(1, 255, (B, L)).astype(np.uint8)
    for shifts in (rng.integers(-2 * L, 2 * L, B).astype(np.int32),
                   np.zeros(B, np.int32)):
        got = np.asarray(shift_rows(jnp.asarray(x), jnp.asarray(shifts)))
        idx = (np.arange(L)[None, :] + shifts[:, None]) % L
        want = np.take_along_axis(x, idx, axis=1)
        np.testing.assert_array_equal(got, want)


def test_shift_rows_shared_shift_planes():
    import jax.numpy as jnp

    from fqtool_tpu.ops.common import shift_rows

    rng = np.random.default_rng(1)
    B, L = 8, 300  # non-power-of-two width
    a = rng.integers(0, 256, (B, L)).astype(np.uint8)
    b = rng.integers(0, 256, (B, L)).astype(np.uint8)
    s = rng.integers(0, L, B).astype(np.int32)
    ga, gb = shift_rows((jnp.asarray(a), jnp.asarray(b)), jnp.asarray(s))
    idx = (np.arange(L)[None, :] + s[:, None]) % L
    np.testing.assert_array_equal(np.asarray(ga), np.take_along_axis(a, idx, 1))
    np.testing.assert_array_equal(np.asarray(gb), np.take_along_axis(b, idx, 1))


def test_overlap_scan_lowerings_agree(monkeypatch):
    """The production uint8-accumulator accept scan must match an
    independent stacked-slice int32 reference formulation of d50 (round 5
    replaced the stack lowering with the 2.8x-faster unrolled u8
    accumulator; this pins their equivalence)."""
    import jax
    import jax.numpy as jnp

    from fqtool_tpu.ops import overlap
    from fqtool_tpu.ops.common import first_true, positions

    def scan_stack_ref(head, moving, O, ol, valid, diff_limit):
        W = overlap.COMPLETE_COMPARE_REQUIRE
        sl = jnp.stack([moving[:, i : i + O] for i in range(W)], axis=1)
        neq = sl != head[:, :W, None]
        in_ol = positions(W)[0][None, :, None] < ol[:, None, :]
        d50 = jnp.sum(neq & in_ol, axis=1).astype(jnp.int32)
        hit = (d50 < diff_limit) & valid
        found = jnp.any(hit, axis=1)
        sel = first_true(hit, jnp.int32(0))
        ol_sel = jnp.max(jnp.where(positions(O) == sel[:, None], ol, 0),
                         axis=1)
        return found, sel, ol_sel

    rng = np.random.default_rng(7)
    B, L = 48, 152
    comp = {65: 84, 84: 65, 67: 71, 71: 67, 78: 78}
    seq1 = rng.choice(np.frombuffer(b"ACGTN", np.uint8), (B, L)).astype(np.uint8)
    seq2 = rng.choice(np.frombuffer(b"ACGTN", np.uint8), (B, L)).astype(np.uint8)
    l1 = rng.integers(60, L + 1, B).astype(np.int32)
    l2 = rng.integers(60, L + 1, B).astype(np.int32)
    for b in range(0, B, 2):  # plant true overlaps
        n1, n2 = int(l1[b]), int(l2[b])
        ol = int(min(n1, n2, rng.integers(35, 90)))
        frag = seq1[b, n1 - ol : n1]
        seq2[b, :ol] = np.array([comp[int(c)] for c in frag[::-1]], np.uint8)

    f = lambda: jax.jit(
        lambda a, b, c, d: overlap.analyze(a, b, c, d, 5, 30))(seq1, l1, seq2, l2)
    production = f()
    monkeypatch.setattr(overlap, "_phase_scan50", scan_stack_ref)
    reference = f()
    for name, a, b in zip(production._fields, production, reference):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_kmer_chunked_mxu_matches_single_block(monkeypatch):
    """Large-k path: the batch-chunked outer-product accumulation must equal
    the single-block result (gate tuned so the 96-row batch splits)."""
    import jax

    from fqtool_tpu.ops import stats

    k = 8
    rng = np.random.default_rng(11)
    B, L = 96, 64
    seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), (B, L)).astype(np.uint8)
    rlen = rng.integers(k, L + 1, B).astype(np.int32)
    one = np.asarray(jax.jit(
        lambda s, r: stats.kmer_counts(s, r, k))(seq, rlen))
    nwin = L - k + 1
    per_row = (4 ** 4 + 4 ** 4) * nwin * 2
    monkeypatch.setattr(stats, "_KMER_ONEHOT_LIMIT", 64 * per_row)
    chunked = np.asarray(jax.jit(
        lambda s, r: stats.kmer_counts(s, r, k))(seq, rlen))
    np.testing.assert_array_equal(one, chunked)


@pytest.mark.parametrize("k", [3, 6])
def test_kmer_mxu_matches_scatter(k, monkeypatch):
    import jax

    from fqtool_tpu.ops import stats

    rng = np.random.default_rng(k)
    B, L = 96, 64
    seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), (B, L),
                     p=[.24, .24, .24, .24, .04]).astype(np.uint8)
    rlen = rng.integers(k, L + 1, B).astype(np.int32)
    sel = rng.random(B) < 0.7

    mxu = np.asarray(jax.jit(
        lambda s, r, se: stats.kmer_counts(s, r, k, se))(seq, rlen, sel))
    monkeypatch.setattr(stats, "_KMER_ONEHOT_LIMIT", 0)  # force scatter path
    sc = np.asarray(jax.jit(
        lambda s, r, se: stats.kmer_counts(s, r, k, se))(seq, rlen, sel))
    np.testing.assert_array_equal(mxu, sc)


def test_merged_names_bulk_matches_scalar():
    """Bulk merged-name assembly must reproduce _merged_name byte-for-byte,
    including the pos-1 off-by-one, pos==0, no-space, and 0-length cases."""
    from fqtool_tpu.io.fastq import make_pack
    from fqtool_tpu.pipeline.pe_runner import (_merged_name,
                                               _merged_names_bulk)

    names = [b"@A123:456 1:N:0:ACGT", b"@nospace", b"@x 1", b"@ leading",
             b"@pair:99887766 2:N:0:TT", b"@q", b"@a b c d"]
    recs = [(nm, b"ACGT", b"+", b"IIII") for nm in names]
    pack = make_pack(recs, False, 1)
    rng = np.random.default_rng(2)
    rows = np.arange(len(names))
    len1 = rng.integers(0, 120000, len(names))
    len2 = rng.integers(0, 120000, len(names))
    buf, off, lens = _merged_names_bulk(pack, rows, len1, len2)
    for i in range(len(names)):
        got = buf[int(off[i]) : int(off[i] + lens[i])].tobytes()
        want = _merged_name(names[i], int(len1[i]), int(len2[i]))
        assert got == want, (names[i], got, want)


def test_packed5_roundtrip_exact():
    """5-bit dictionary transport: encode5_host -> decode5_device must be
    byte-exact for binned-quality content, and must refuse (None) when the
    (base, qual) alphabet exceeds 32 values."""
    import jax

    from fqtool_tpu.ops.packed import (decode5_device, encode5_host,
                                       encode_host)

    rng = np.random.default_rng(9)
    for trial in range(4):
        B = int(rng.integers(3, 60))
        L = int(rng.integers(1, 220))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), (B, L)).astype(np.uint8)
        qual = rng.choice(np.frombuffer(b"#5A?FE", np.uint8), (B, L)).astype(np.uint8)
        lens = rng.integers(0, L + 1, B)
        mask = np.arange(L)[None, :] < lens[:, None]
        seq = np.where(mask, seq, 0).astype(np.uint8)
        qual = np.where(mask, qual, 0).astype(np.uint8)
        enc = encode_host(seq, qual)
        packed, d32 = encode5_host(enc)
        assert packed.shape[1] == -(-L // 8) * 5  # 0.625x the bytes
        s2, q2 = jax.jit(lambda p, d: decode5_device(p, d, L))(packed, d32)
        np.testing.assert_array_equal(np.asarray(s2), seq)
        np.testing.assert_array_equal(np.asarray(q2), qual)
    # >32 distinct (base, qual) values: must decline
    qual = rng.integers(33, 80, (8, 64)).astype(np.uint8)
    seq = np.full((8, 64), ord("A"), np.uint8)
    assert encode5_host(encode_host(seq, qual)) is None


def test_output_writer_per_call_block_framing(tmp_path):
    """Every write call is a deflate-block boundary: the compressed stream
    of two writers that receive the same bytes split at the same call
    boundaries must be identical, and must decompress to the input."""
    import gzip

    from fqtool_tpu.io.fastq import OutputWriter

    rng = np.random.default_rng(3)
    chunks = [rng.bytes(int(n)) for n in rng.integers(1, 3_000_000, 6)]
    p1, p2 = tmp_path / "a.gz", tmp_path / "b.gz"
    with OutputWriter(str(p1), 4) as w:
        for c in chunks:
            w.write(c)
    with OutputWriter(str(p2), 4) as w:
        for c in chunks:
            w.write(c)
    assert p1.read_bytes() == p2.read_bytes()
    assert gzip.open(p1, "rb").read() == b"".join(chunks)


def test_part_writer_matches_output_writer_framing(tmp_path):
    """A PartStreamWriter's compressed span for a pack must equal the bytes
    OutputWriter would produce for the same write call (minus header and
    trailer) -- the invariant the concat-only multi-host merge rests on."""
    from fqtool_tpu.dist.multihost import (PartStreamWriter, _crc32_combine)
    from fqtool_tpu.io.fastq import _GZIP_HEADER, OutputWriter

    rng = np.random.default_rng(4)
    packs = [rng.bytes(int(n)) for n in rng.integers(1, 2_500_000, 5)]

    ref = tmp_path / "single.gz"
    with OutputWriter(str(ref), 3) as w:
        for p in packs:
            w.write(p)
    single = ref.read_bytes()

    pw = PartStreamWriter(str(tmp_path / "out.fq.gz"), rank=0, compression=3)
    for i, p in enumerate(packs):
        pw.write(i, p)
    pw.close()
    part = open(pw.part_path, "rb").read()

    # spans concatenated in manifest order == single-process body
    body = single[len(_GZIP_HEADER):-10]  # strip header, finish block, trailer
    assert part == body[:len(part)]
    assert sum(e[1] for e in pw.index) == len(part)
    # combined crc equals the stream crc
    import zlib
    crc = 0
    for (_pidx, _clen, pcrc, rlen) in pw.index:
        crc = _crc32_combine(crc, pcrc, rlen)
    assert crc == zlib.crc32(b"".join(packs))
