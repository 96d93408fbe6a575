"""Packed seq+qual transport: roundtrip exactness and pipeline equivalence."""

from __future__ import annotations

import numpy as np

from fqtool_tpu.ops.packed import QUAL_MAX, decode_device, encode_host


def _random_batch(b=64, l=96, seed=0):
    rng = np.random.default_rng(seed)
    seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(b, l)).astype(np.uint8)
    qual = rng.integers(33, QUAL_MAX + 1, size=(b, l)).astype(np.uint8)
    lens = rng.integers(10, l + 1, size=(b,)).astype(np.int32)
    mask = np.arange(l)[None, :] < lens[:, None]
    seq = np.where(mask, seq, 0).astype(np.uint8)
    qual = np.where(mask, qual, 0).astype(np.uint8)
    return seq, qual, lens


def test_roundtrip_exact():
    seq, qual, _ = _random_batch()
    enc = encode_host(seq, qual)
    assert enc is not None
    dseq, dqual = (np.asarray(x) for x in decode_device(enc))
    assert np.array_equal(dseq, seq)
    assert np.array_equal(dqual, qual)


def test_fallback_cases():
    seq, qual, _ = _random_batch()
    low = seq.copy()
    low[3, 5] = ord("a")  # lowercase base: not encodable
    assert encode_host(low, qual) is None
    hot = qual.copy()
    hot[hot > 0] = QUAL_MAX + 1  # quality above the encodable span
    assert encode_host(seq, hot) is None
    bad = qual.copy()
    bad[0, 0] = 10  # live quality below '!'
    assert encode_host(seq, bad) is None
    assert encode_host(seq, qual) is not None  # originals still fine


def test_se_pipeline_equivalence():
    from fqtool_tpu.config.options import Options
    from fqtool_tpu.pipeline.se import _se_pipeline_packed, se_pipeline

    opt = Options()
    opt.qual_filter.enabled = True
    opt.polyg_trim.enabled = True
    opt.update()
    p = opt.kernel_params()
    seq, qual, lens = _random_batch(b=128, l=64, seed=3)
    z = np.zeros_like(lens)
    ones = np.ones(len(lens), bool)
    kw = dict(p=p, adapter_r1=b"AGATCGGAAGAGC", use_start0=False,
              with_kmer=False)
    raw = se_pipeline(seq, qual, lens, z, ones, ones, **kw)
    enc = encode_host(seq, qual)
    packed = _se_pipeline_packed(enc, lens, z, ones, ones, **kw)
    flat_r, _ = __import__("jax").tree_util.tree_flatten(raw)
    flat_p, _ = __import__("jax").tree_util.tree_flatten(packed)
    for a, b in zip(flat_r, flat_p):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pe_pipeline_equivalence():
    from fqtool_tpu.config.options import Options
    from fqtool_tpu.pipeline.pe import _pe_pipeline_packed, pe_pipeline

    opt = Options()
    opt.correction.enabled = True
    opt.merge_pe.enabled = True
    opt.merge_pe.out = "m.fq"
    opt.update()
    p1 = opt.kernel_params(is_r2=False)
    p2 = opt.kernel_params(is_r2=True)
    seq1, qual1, lens1 = _random_batch(b=128, l=64, seed=5)
    seq2, qual2, lens2 = _random_batch(b=128, l=64, seed=6)
    z = np.zeros_like(lens1)
    ones = np.ones(len(lens1), bool)
    kw = dict(p=p1, p2=p2, adapter_r1=b"", adapter_r2=b"", use_start0=False,
              with_kmer=False, discard_unmerged=False)
    raw = pe_pipeline(seq1, qual1, lens1, seq2, qual2, lens2, z, z, ones,
                      ones, **kw)
    packed = _pe_pipeline_packed(encode_host(seq1, qual1), lens1,
                                 encode_host(seq2, qual2), lens2,
                                 z, z, ones, ones, **kw)
    flat_r, _ = __import__("jax").tree_util.tree_flatten(raw)
    flat_p, _ = __import__("jax").tree_util.tree_flatten(packed)
    for a, b in zip(flat_r, flat_p):
        assert np.array_equal(np.asarray(a), np.asarray(b))
