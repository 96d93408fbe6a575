"""PolyG / polyX tail trimming.

Vectorized port of ``PolyX::trimPolyG`` / ``trimPolyX``
(reference: src/polyx.cpp:14-101).  Both scan from the 3' end with a growing
mismatch budget ``min(maxMismatch, max(1, (i+1)/each))`` and trigger when the
scanned length (break position + 1) reaches ``compareReq``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .common import A, C, G, N, T, first_true, last_true, positions, valid_mask


class PolyTrimResult(NamedTuple):
    rlen: jnp.ndarray      # int32 [B] new length
    trimmed: jnp.ndarray   # bool [B] a trim event was recorded
    trim_len: jnp.ndarray  # int32 [B] bases recorded by addPolyXTrimmed
    base_idx: jnp.ndarray  # int32 [B] 0..4 = A/T/C/G/N index recorded


def _reversed_reads(seq: jnp.ndarray, rlen: jnp.ndarray) -> jnp.ndarray:
    """rev[b, i] = seq[b, rlen-1-i]; padding positions read garbage and must be
    masked by i < rlen."""
    L = seq.shape[1]
    idx = jnp.clip(rlen[:, None] - 1 - positions(L), 0, L - 1)
    return jnp.take_along_axis(seq, idx, axis=1)


def _allowed_mismatch(L: int, max_mismatch: int, each: int) -> jnp.ndarray:
    i1 = positions(L) + 1  # i + 1
    return jnp.minimum(max_mismatch, jnp.maximum(1, i1 // each))


def trim_polyg(seq: jnp.ndarray, rlen: jnp.ndarray, compare_req: int,
               max_mismatch: int, each: int) -> PolyTrimResult:
    """reference: src/polyx.cpp:14-38.

    Returns the new length plus the FilterResult event (base index 3 = G,
    length = rlen - firstGpos, recorded whenever the scan length reaches
    compareReq -- even when resize() is a no-op, e.g. firstGpos = -1 on an
    empty read under the PE argument-swap parameters).
    """
    B, L = seq.shape
    mask = valid_mask(rlen, L)
    rev = _reversed_reads(seq, rlen)
    is_g = (rev == G) & mask
    mm = jnp.cumsum((~is_g & mask).astype(jnp.int32), axis=1)
    allowed = _allowed_mismatch(L, max_mismatch, each)
    # break at first scanned i with mismatch > allowed; else i = rlen
    break_hit = (mm > allowed) & mask
    i_star = first_true(break_hit, rlen)
    # first G position = rlen - 1 - (largest scanned i <= i_star with G);
    # init rlen - 1 when no G seen (polyx.cpp:19,24)
    scan_mask = positions(L) <= i_star[:, None]
    j_star = last_true(is_g & scan_mask, jnp.int32(0))
    has_g = jnp.any(is_g & scan_mask, axis=1)
    first_g_pos = jnp.where(has_g, rlen - 1 - j_star, rlen - 1)
    triggered = (i_star + 1) >= compare_req
    trim_len = rlen - first_g_pos
    # resize(firstGpos) is a no-op when firstGpos < 0 (read.h:181-187)
    new_rlen = jnp.where(triggered & (first_g_pos >= 0), first_g_pos, rlen)
    return PolyTrimResult(new_rlen, triggered, trim_len,
                          jnp.full((B,), 3, jnp.int32))


# ATCGN tally order used by trimPolyX (polyx.cpp:48-49)
_POLYX_BASES = (A, T, C, G, N)


def trim_polyx(seq: jnp.ndarray, rlen: jnp.ndarray, trim_chr: str,
               compare_req: int, max_mismatch: int, each: int) -> PolyTrimResult:
    """reference: src/polyx.cpp:45-101."""
    B, L = seq.shape
    mask = valid_mask(rlen, L)
    rev = _reversed_reads(seq, rlen)
    in_trim = [c in trim_chr for c in "ATCGN"]

    counts = []  # cumulative tallies per base, [B, L] each
    for bchar in _POLYX_BASES:
        if bchar == N:
            # default case of the switch: anything not A/T/C/G tallies as N
            hit = ~((rev == A) | (rev == T) | (rev == C) | (rev == G)) & mask
        else:
            hit = (rev == bchar) & mask
        counts.append(jnp.cumsum(hit.astype(jnp.int32), axis=1))

    allowed = _allowed_mismatch(L, max_mismatch, each)
    cmp = positions(L) + 1
    # continue while ANY trim base still fits the budget (polyx.cpp:71-79)
    keep_going = jnp.zeros((B, L), bool)
    for b in range(5):
        if in_trim[b]:
            keep_going = keep_going | (cmp - counts[b] <= allowed)
    break_hit = ~keep_going & mask
    pos_star = first_true(break_hit, rlen)  # loop-exit pos (== rlen if completed)
    triggered = (pos_star + 1) >= compare_req

    # tallies include the breaking position; for a completed scan use the last
    # valid index
    tally_idx = jnp.clip(jnp.minimum(pos_star, rlen - 1), 0, L - 1)
    tallies = jnp.stack(
        [jnp.take_along_axis(c, tally_idx[:, None], axis=1)[:, 0] for c in counts],
        axis=1)  # [B, 5]
    # dominant trim base: strict > comparison walking A,T,C,G,N
    # (polyx.cpp:83-90) == first argmax over trim bases in that order
    sel = jnp.array([(0 if t else -1) for t in in_trim], jnp.int32)[None, :]
    masked_tallies = jnp.where(sel == 0, tallies, -1)
    poly = jnp.argmax(masked_tallies, axis=1).astype(jnp.int32)  # [B]
    poly_char = jnp.array([A, T, C, G, N], jnp.uint8)[poly]

    # pos = min(rlen-1, pos); back up to the last occurrence of the dominant
    # base (polyx.cpp:92-95): largest p <= pos with rev[p] == polyBase, else 0
    pos_cap = jnp.minimum(rlen - 1, pos_star)
    match_dom = (rev == poly_char[:, None]) & (positions(L) <= pos_cap[:, None]) & mask
    p_final = last_true(match_dom, jnp.int32(0))
    # rlen == 0: the backup loop never runs and pos stays at min(rlen-1, pos) = -1
    p_final = jnp.where(rlen == 0, pos_cap, p_final)
    trim_len = p_final + 1
    new_len = rlen - p_final - 1
    new_rlen = jnp.where(triggered & (new_len >= 0), new_len, rlen)
    return PolyTrimResult(new_rlen, triggered, trim_len, poly)
