"""Single-end device pipeline.

Jit-compiled composition of the per-read kernels in the exact op order of
``SingleEndProcessor::processSingleEnd`` (reference: src/seprocessor.cpp:290-353):

  pre-stats -> (dup keys) -> [index filter + UMI are host-side] ->
  trimAndCut -> polyG -> adapter-by-sequence -> polyX -> max-length resize ->
  passFilter -> post-stats.

All per-read results come back as index arithmetic (spans + event codes);
the host materializes output records from the original byte arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config.options import KernelParams
from ..ops import adapter as ops_adapter
from ..ops import dup as ops_dup
from ..ops import filters as ops_filters
from ..ops import polyx as ops_polyx
from ..ops import qualcut as ops_qualcut
from ..ops import stats as ops_stats
from ..ops.common import align, align_static
from .blob import BlobCall


@functools.partial(
    jax.jit,
    static_argnames=("p", "adapter_r1", "use_start0", "with_kmer"),
)
def se_pipeline(
    seq: jnp.ndarray,
    qual: jnp.ndarray,
    lens: jnp.ndarray,
    start0: jnp.ndarray,
    keep: jnp.ndarray,
    real: jnp.ndarray,
    p: KernelParams,
    adapter_r1: bytes = b"",
    use_start0: bool = False,
    with_kmer: bool = False,
    start0_static: int = -1,
):
    """Run the full SE per-read pipeline on one pack.

    Args:
      seq, qual: uint8 [B, L] raw reads (zero padded).
      lens: int32 [B] raw lengths.
      start0: int32 [B] host-computed front offset (UMI trimming); only applied
        when ``use_start0``.
      keep: bool [B]; False = read removed by the host index filter (it still
        contributes to pre-stats but to nothing else, seprocessor.cpp:304-307).
      p: static kernel parameters.
      adapter_r1: static ASCII adapter sequence for trimBySequence ('' = none).
    """
    out = {}
    lens = lens.astype(jnp.int32)
    keep = keep & real  # `real` masks off chunk-padding rows entirely

    # 1. pre-filtering stats on the raw reads (seprocessor.cpp:298)
    out["pre"] = ops_stats.stat_batch(seq, qual, lens, select=real)
    if with_kmer and p.kmer_len:
        out["pre_kmer"] = ops_stats.kmer_counts(seq, lens, p.kmer_len, select=real)

    # 2. duplication keys on the raw reads (seprocessor.cpp:300-302)
    if p.dup_enabled:
        out["dup"] = ops_dup.dup_keys_se(seq, lens, p.dup_keylen)

    # 3. UMI front-trim offsets computed on host; realign.  Fixed-length
    # UMIs give a uniform offset (detected by the runner): static slice+pad
    # instead of the per-row gather
    if use_start0:
        if start0_static >= 0:
            seq = align_static(seq, start0_static)
            qual = align_static(qual, start0_static)
        else:
            seq, qual = align((seq, qual), start0)
        lens = lens - start0
    else:
        start0 = jnp.zeros_like(lens)

    # 4. force trims + quality cuts (seprocessor.cpp:313)
    tc = ops_qualcut.trim_and_cut(seq, qual, lens, p.front, p.tail, p)
    if p.cut_front:
        seq, qual = align((seq, qual), tc.front)
    elif p.front > 0:
        # without the quality front-cut the offset is the static force trim:
        # a slice+pad beats the per-row gather by ~100x at full chunk width
        seq = align_static(seq, p.front)
        qual = align_static(qual, p.front)
    rlen = tc.rlen
    dropped = tc.dropped

    # 5. polyG trimming (seprocessor.cpp:316-318); skipped for dropped reads
    if p.polyg_enabled:
        pg = ops_polyx.trim_polyg(seq, rlen, p.polyg_min_len,
                                  p.polyg_max_mismatch, p.polyg_each)
        rlen = jnp.where(dropped, rlen, pg.rlen)
        out["polyg_trimmed"] = pg.trimmed & ~dropped
        out["polyg_trim_len"] = pg.trim_len.astype(jnp.int16)

    # 6. adapter trimming by provided sequence (seprocessor.cpp:321-323)
    if p.adapter_trimming_enabled and adapter_r1:
        out["len_after_polyg"] = rlen.astype(jnp.int16)
        ad = ops_adapter.trim_by_sequence(
            seq, rlen, np.frombuffer(adapter_r1, np.uint8))
        rlen = jnp.where(dropped, rlen, ad.rlen)
        out["adapter_found"] = ad.found & ~dropped
        out["adapter_pos"] = ad.pos.astype(jnp.int16)

    # 7. polyX trimming (seprocessor.cpp:326-329)
    if p.polyx_enabled:
        px = ops_polyx.trim_polyx(seq, rlen, p.polyx_trim_chr, p.polyx_min_len,
                                  p.polyx_max_mismatch, p.polyx_each)
        rlen = jnp.where(dropped, rlen, px.rlen)
        out["polyx_trimmed"] = px.trimmed & ~dropped
        out["polyx_trim_len"] = px.trim_len.astype(jnp.int16)
        out["polyx_base"] = px.base_idx.astype(jnp.uint8)

    # 8. max length resize (seprocessor.cpp:332-336)
    if p.max_len > 0:
        rlen = jnp.where(dropped, rlen, jnp.minimum(rlen, p.max_len))

    # 9. pass/fail classification (seprocessor.cpp:339)
    result = ops_filters.pass_filter(seq, qual, rlen, dropped, p)
    passed = (result == ops_filters.PASS_FILTER) & keep

    # 10. post-filtering stats on passing reads (seprocessor.cpp:342-345)
    out["post"] = ops_stats.stat_batch(seq, qual, rlen, select=passed)
    if with_kmer and p.kmer_len:
        out["post_kmer"] = ops_stats.kmer_counts(seq, rlen, p.kmer_len, select=passed)

    # compact dtypes: the remote fetch is latency/bandwidth bound, and
    # results / spans fit in 8/16 bits whenever the (static) read width does
    span_t = jnp.int16 if seq.shape[1] < (1 << 15) else jnp.int32
    out["result"] = result.astype(jnp.uint8)
    out["passed"] = passed
    out["front"] = (start0 + tc.front).astype(span_t)
    out["rlen"] = rlen.astype(span_t)
    out["dropped"] = dropped
    return out


# blob-returning call used by the production runner (two device->host
# transfers per chunk instead of one per output array)
se_pipeline_call = BlobCall(
    se_pipeline.__wrapped__,
    ("p", "adapter_r1", "use_start0", "with_kmer", "start0_static"))


def _se_pipeline_packed(enc, lens, start0, keep, real, **kw):
    """Packed-transport variant: ``enc`` carries seq+qual in one uint8 matrix
    (ops/packed.py), halving the host->device payload."""
    from ..ops.packed import decode_device

    seq, qual = decode_device(enc)
    return se_pipeline.__wrapped__(seq, qual, lens, start0, keep, real, **kw)


se_packed_call = BlobCall(
    _se_pipeline_packed,
    ("p", "adapter_r1", "use_start0", "with_kmer", "start0_static"))


def _se_pipeline_packed5(packed, lens, start0, keep, real, dict32, *,
                         enc_width, **kw):
    """5-bit dictionary transport variant (ops/packed.py::encode5_host):
    0.625x the wire bytes of the 1-byte encoding."""
    from ..ops.packed import decode5_device

    seq, qual = decode5_device(packed, dict32, enc_width)
    return se_pipeline.__wrapped__(seq, qual, lens, start0, keep, real, **kw)


se_packed5_call = BlobCall(
    _se_pipeline_packed5,
    ("p", "adapter_r1", "use_start0", "with_kmer", "start0_static",
     "enc_width"))
