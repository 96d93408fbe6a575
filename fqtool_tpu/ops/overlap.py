"""Pair overlap analysis.

Vectorized port of ``OverlapAnalysis::analyze``
(reference: src/overlapanalysis.cpp:7-72): read1 is compared against the
reverse complement of read2 at every candidate offset in parallel; the first
offset in the reference scan order (phase 1: 0..len1-require-1, then phase 2:
0,-1,..,require-len2+1) that satisfies the acceptance predicate wins.

Acceptance replicates the early-exit loop exactly: with limit = diff_limit and
d50 = mismatches among the first 50 compared bases,

    accept  <=>  full_diff < limit  OR  (d50 < limit AND overlap_len > 50)

because the scan breaks (rejecting) exactly when the running diff reaches the
limit before compare index 50 (overlapanalysis.cpp:27-29,32).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .common import complement, first_true, positions

COMPLETE_COMPARE_REQUIRE = 50  # overlapanalysis.cpp:14


class OverlapResult(NamedTuple):
    overlapped: jnp.ndarray   # bool [B]
    offset: jnp.ndarray       # int32 [B]
    overlap_len: jnp.ndarray  # int32 [B]
    diff: jnp.ndarray         # int32 [B]


def reverse_complement(seq: jnp.ndarray, rlen: jnp.ndarray) -> jnp.ndarray:
    """rc[b, i] = complement(seq[b, rlen-1-i]); padding positions hold the
    complement of garbage and must be masked by i < rlen."""
    L = seq.shape[1]
    idx = jnp.clip(rlen[:, None] - 1 - positions(L), 0, L - 1)
    return complement(jnp.take_along_axis(seq, idx, axis=1))


def _phase_scan(a: jnp.ndarray, b_shifted: jnp.ndarray, ol: jnp.ndarray,
                valid: jnp.ndarray, diff_limit: int):
    """Shared accept/select logic.  ``a``: [B, 1, L], ``b_shifted``: [B, O, L],
    ``ol``/``valid``: [B, O]."""
    L = b_shifted.shape[2]
    pos = positions(L)[None, :, :]  # [1, 1, L]
    neq = a != b_shifted
    in_ol = pos < ol[:, :, None]
    full = jnp.sum(neq & in_ol, axis=2).astype(jnp.int32)
    d50 = jnp.sum(neq & in_ol & (pos < COMPLETE_COMPARE_REQUIRE), axis=2).astype(jnp.int32)
    accept = (full < diff_limit) | ((d50 < diff_limit) & (ol > COMPLETE_COMPARE_REQUIRE))
    hit = accept & valid
    found = jnp.any(hit, axis=1)
    sel = first_true(hit, jnp.int32(0))
    take = jnp.take_along_axis
    ol_sel = take(ol, sel[:, None], axis=1)[:, 0]
    diff_sel = take(full, sel[:, None], axis=1)[:, 0]
    return found, sel, ol_sel, diff_sel


def analyze(seq1: jnp.ndarray, rlen1: jnp.ndarray,
            seq2: jnp.ndarray, rlen2: jnp.ndarray,
            diff_limit: int, overlap_require: int) -> OverlapResult:
    """All-offsets overlap analysis for a batch of pairs."""
    B, L1 = seq1.shape
    L2 = seq2.shape[1]
    L = max(L1, L2)
    rs2 = jnp.pad(reverse_complement(seq2, rlen2), ((0, 0), (0, L - L2)))
    s1 = jnp.pad(seq1, ((0, 0), (0, L - L1)))
    i_ax = positions(L)[0]  # [L]
    zero = jnp.zeros((B,), jnp.int32)

    # ---- phase 1: offset o >= 0; compare s1[o+i] vs rs2[i] ----
    O1 = max(L1 - overlap_require, 0)
    if O1 > 0:
        o_ax = positions(O1)[0]
        s1_sh = s1[:, jnp.clip(o_ax[:, None] + i_ax[None, :], 0, L - 1)]  # [B,O1,L]
        ol1 = jnp.minimum(rlen1[:, None] - o_ax[None, :], rlen2[:, None])
        valid1 = o_ax[None, :] < (rlen1[:, None] - overlap_require)
        found1, o1, ol_sel1, diff_sel1 = _phase_scan(
            rs2[:, None, :], s1_sh, ol1, valid1, diff_limit)
    else:
        found1, o1, ol_sel1, diff_sel1 = jnp.zeros((B,), bool), zero, zero, zero

    # ---- phase 2: offset o <= 0 (j = -o); compare s1[i] vs rs2[j+i] ----
    O2 = max(L2 - overlap_require, 0)
    if O2 > 0:
        j_ax = positions(O2)[0]
        rs2_sh = rs2[:, jnp.clip(j_ax[:, None] + i_ax[None, :], 0, L - 1)]  # [B,O2,L]
        ol2 = jnp.minimum(rlen1[:, None], rlen2[:, None] - j_ax[None, :])
        valid2 = j_ax[None, :] < (rlen2[:, None] - overlap_require)
        found2, j2, ol_sel2, diff_sel2 = _phase_scan(
            s1[:, None, :], rs2_sh, ol2, valid2, diff_limit)
    else:
        found2, j2, ol_sel2, diff_sel2 = jnp.zeros((B,), bool), zero, zero, zero

    overlapped = found1 | found2
    offset = jnp.where(found1, o1, -j2)
    overlap_len = jnp.where(found1, ol_sel1, jnp.where(found2, ol_sel2, 0))
    diff = jnp.where(found1, diff_sel1, jnp.where(found2, diff_sel2, 0))
    offset = jnp.where(overlapped, offset, 0)
    return OverlapResult(overlapped, offset, overlap_len, diff)
