"""Per-cycle statistics kernels.

Vectorized port of ``Stats::statRead`` (reference: src/stats.cpp:237-295):
per-cycle Q20/Q30/content/quality histograms binned by ``base & 0x07``, plus
optional k-mer counting.  Q20/Q30 use strict ``>`` against '5'/'?'
(stats.cpp:250-259).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .common import Q20_CHAR, Q30_CHAR, seq2int_codes, valid_mask


class BatchStats(NamedTuple):
    cycle_q20: jnp.ndarray       # int32 [8, L]
    cycle_q30: jnp.ndarray       # int32 [8, L]
    cycle_content: jnp.ndarray   # int32 [8, L]
    cycle_quality: jnp.ndarray   # int32 [8, L]
    cycle_total: jnp.ndarray     # int32 [L]
    cycle_total_qual: jnp.ndarray  # int32 [L]
    reads: jnp.ndarray           # int32 []
    length_sum: jnp.ndarray      # int32 []


def stat_batch(seq: jnp.ndarray, qual: jnp.ndarray, rlen: jnp.ndarray,
               select: jnp.ndarray | None = None) -> BatchStats:
    """Accumulate per-cycle statistics over a batch.

    ``select`` (bool [B]) restricts which reads contribute (post-filter stats
    only cover passing reads, seprocessor.cpp:342-345).
    """
    B, L = seq.shape
    mask = valid_mask(rlen, L)
    if select is not None:
        mask = mask & select[:, None]
    bidx = (seq & 0x07).astype(jnp.int32)
    qv = qual.astype(jnp.int32)
    q20 = qv > Q20_CHAR
    q30 = qv > Q30_CHAR
    qoff = jnp.where(mask, qv - 33, 0)

    cq20, cq30, ccontent, cquality = [], [], [], []
    for k in range(8):
        sel = (bidx == k) & mask
        cq20.append(jnp.sum(sel & q20, axis=0))
        cq30.append(jnp.sum(sel & q30, axis=0))
        ccontent.append(jnp.sum(sel, axis=0))
        cquality.append(jnp.sum(jnp.where(sel, qoff, 0), axis=0))

    if select is None:
        nreads = jnp.int32(B)
        lsum = jnp.sum(rlen)
    else:
        nreads = jnp.sum(select).astype(jnp.int32)
        lsum = jnp.sum(jnp.where(select, rlen, 0))
    return BatchStats(
        cycle_q20=jnp.stack(cq20).astype(jnp.int32),
        cycle_q30=jnp.stack(cq30).astype(jnp.int32),
        cycle_content=jnp.stack(ccontent).astype(jnp.int32),
        cycle_quality=jnp.stack(cquality).astype(jnp.int32),
        cycle_total=jnp.sum(mask, axis=0).astype(jnp.int32),
        cycle_total_qual=jnp.sum(qoff, axis=0).astype(jnp.int32),
        reads=nreads,
        length_sum=lsum.astype(jnp.int32),
    )


def kmer_counts(seq: jnp.ndarray, rlen: jnp.ndarray, kmer_len: int,
                select: jnp.ndarray | None = None) -> jnp.ndarray:
    """K-mer histogram [4**kmer_len] over all valid windows
    (stats.cpp:266-274): a window ending at position i (i >= k-1, i < rlen)
    counts iff all k bases are A/T/C/G."""
    B, L = seq.shape
    k = kmer_len
    if k <= 0 or L < k:
        return jnp.zeros((4 ** max(k, 1),), jnp.int32)
    codes = seq2int_codes(seq).astype(jnp.int32)  # -1 invalid
    nwin = L - k + 1
    keys = jnp.zeros((B, nwin), jnp.int32)
    ok = jnp.ones((B, nwin), bool)
    for j in range(k):
        c = codes[:, j : j + nwin]
        keys = keys * 4 + jnp.maximum(c, 0)
        ok = ok & (c >= 0)
    # window end position i = w + k - 1 must satisfy i < rlen
    end_ok = (jnp.arange(nwin, dtype=jnp.int32)[None, :] + (k - 1)) < rlen[:, None]
    ok = ok & end_ok
    if select is not None:
        ok = ok & select[:, None]
    hist = jnp.zeros((4 ** k,), jnp.int32)
    return hist.at[keys.reshape(-1)].add(ok.reshape(-1).astype(jnp.int32))
