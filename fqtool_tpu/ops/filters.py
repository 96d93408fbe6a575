"""Read pass/fail classification.

Vectorized port of ``Filter::passFilter`` / ``passLowComplexityFliter``
(reference: src/filter.cpp:3-67) with the same failure precedence:
quality-ratio -> mean-quality -> N-count -> too-short -> too-long ->
low-complexity, and NULL/empty reads classified FAIL_LENGTH.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config.options import KernelParams
from .common import N, valid_mask

# filter result codes (reference: src/common.h:9-16)
PASS_FILTER = 0
FAIL_POLY_X = 4
FAIL_OVERLAP = 8
FAIL_N_BASE = 12
FAIL_LENGTH = 16
FAIL_TOO_LONG = 17
FAIL_QUALITY = 20
FAIL_COMPLEXITY = 24
FILTER_RESULT_TYPES = 32

FAILED_TYPES = [
    "passed", "", "", "",
    "failed_polyx_filter", "", "", "",
    "failed_bad_overlap", "", "", "",
    "failed_too_many_n_bases", "", "", "",
    "failed_too_short", "failed_too_long", "", "",
    "failed_quality_filter", "", "", "",
    "failed_low_complexity", "", "", "",
    "", "", "", "",
]


def pass_filter(seq: jnp.ndarray, qual: jnp.ndarray, rlen: jnp.ndarray,
                dropped: jnp.ndarray, p: KernelParams) -> jnp.ndarray:
    """Return int32 [B] filter-result codes.

    ``dropped`` marks reads the trimming stage consumed (passFilter receives
    NULL -> FAIL_LENGTH, filter.cpp:4-6).
    """
    B, L = seq.shape
    mask = valid_mask(rlen, L)
    result = jnp.full((B,), PASS_FILTER, jnp.int32)

    if p.qual_filter_enabled or p.length_filter_enabled:
        qv = qual.astype(jnp.int32)
        total_qual = jnp.sum(jnp.where(mask, qv - 33, 0), axis=1)
        n_num = jnp.sum(mask & (seq == N), axis=1)
        low_num = jnp.sum(mask & (qv < p.low_quality_limit), axis=1)
    else:
        total_qual = n_num = low_num = jnp.zeros((B,), jnp.int32)

    if p.complexity_filter_enabled:
        # fraction of adjacent differing bases over rlen-1 pairs
        # (filter.cpp:54-67); rlen <= 1 fails
        diff_adj = (seq[:, :-1] != seq[:, 1:]) & valid_mask(rlen - 1, L - 1)
        diff = jnp.sum(diff_adj, axis=1)
        denom = jnp.maximum(rlen - 1, 1).astype(jnp.float32)
        complexity_ok = (rlen > 1) & (
            diff.astype(jnp.float32) / denom >= jnp.float32(p.complexity_threshold)
        )
        result = jnp.where(~complexity_ok, FAIL_COMPLEXITY, result)

    if p.length_filter_enabled:
        if p.max_read_length > 0:
            result = jnp.where(rlen > p.max_read_length, FAIL_TOO_LONG, result)
        result = jnp.where(rlen < p.min_read_length, FAIL_LENGTH, result)

    if p.qual_filter_enabled:
        result = jnp.where(n_num > p.n_base_limit, FAIL_N_BASE, result)
        if p.average_quality_limit > 0:
            # double(totalQual)/rlen < limit  (filter.cpp:29)
            rl = jnp.maximum(rlen, 1).astype(jnp.float32)
            result = jnp.where(
                jnp.float32(p.average_quality_limit) > total_qual.astype(jnp.float32) / rl,
                FAIL_QUALITY, result)
        result = jnp.where(low_num > p.low_quality_base_limit, FAIL_QUALITY, result)

    # NULL / zero-length reads (filter.cpp:4-6)
    result = jnp.where(dropped | (rlen == 0), FAIL_LENGTH, result)
    return result
