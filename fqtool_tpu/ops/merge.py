"""Pair merging.

Device-side construction of merged reads, porting
``OverlapAnalysis::merge`` (reference: src/overlapanalysis.cpp:74-104):
merged = r1[0 : ol + max(0, offset)] ++ revcomp(r2)[ol : ol + len2m] where
len2m = rlen2 - ol when offset > 0 else 0.  The merged name mangling (with its
off-by-one quirk) happens on host.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .common import complement, positions, shift_rows
from .overlap import OverlapResult


class MergeResult(NamedTuple):
    seq: jnp.ndarray     # uint8 [B, LM]
    qual: jnp.ndarray    # uint8 [B, LM]
    rlen: jnp.ndarray    # int32 [B] merged length (len1 + len2m)
    len1: jnp.ndarray    # int32 [B] bases taken from read1
    len2: jnp.ndarray    # int32 [B] bases taken from revcomp(read2)


def merge_pairs(seq1, qual1, rlen1, seq2, qual2, rlen2, ov: OverlapResult) -> MergeResult:
    B, L1 = seq1.shape
    L2 = seq2.shape[1]
    LM = L1 + L2

    # No gathers at all: revcomp(r2)[p] = complement(r2)[:, ::-1][p + L2-rlen2]
    # (static lane flip), and the per-row index shift is a barrel rotate.
    rcr2 = complement(seq2)[:, ::-1]
    rqr2 = qual2[:, ::-1]

    len1 = ov.overlap_len + jnp.maximum(0, ov.offset)
    len2 = jnp.where(ov.offset > 0, rlen2 - ov.overlap_len, 0)
    mlen = len1 + len2

    pos = positions(LM)
    from_r1 = pos < len1[:, None]
    # merged[i] (i >= len1) = revcomp(r2)[ol + i - len1]
    #                       = rcr2[(L2 - rlen2) + ol + i - len1]
    # For len1 <= i < mlen the shifted index stays in [0, L2) (no wrap);
    # positions past mlen hold wrapped garbage, masked by rlen downstream.
    shift = (L2 - rlen2) + ov.overlap_len - len1
    part2_seq, part2_qual = shift_rows(
        (jnp.pad(rcr2, ((0, 0), (0, LM - L2))),
         jnp.pad(rqr2, ((0, 0), (0, LM - L2)))), shift)
    seq1_p = jnp.pad(seq1, ((0, 0), (0, LM - L1)))
    qual1_p = jnp.pad(qual1, ((0, 0), (0, LM - L1)))
    mseq = jnp.where(from_r1, seq1_p, part2_seq)
    mqual = jnp.where(from_r1, qual1_p, part2_qual)
    return MergeResult(mseq, mqual, mlen, len1, len2)
