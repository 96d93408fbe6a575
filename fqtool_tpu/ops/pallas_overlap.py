"""Fused Pallas TPU kernel for pair overlap analysis.

The jnp formulation (`ops.overlap.analyze`) materializes [B, offsets, L]
comparison tensors in HBM; this kernel keeps one read tile in VMEM, scans all
offsets with rolling window slices, and folds the first-accepted offset
on the fly -- emitting just four scalars per read.  Semantics are identical
to ``OverlapAnalysis::analyze`` (reference: src/overlapanalysis.cpp:7-72);
cross-validated against the jnp path in tests/test_overlap_mxu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import positions
from .overlap import COMPLETE_COMPARE_REQUIRE, OverlapResult, reverse_complement

TILE = 256  # reads per grid step


def _kernel(s1_ref, rs2_ref, rlen1_ref, rlen2_ref,
            found_ref, off_ref, ol_ref, diff_ref,
            *, L, diff_limit, overlap_require):
    rlen1 = rlen1_ref[:, 0]                     # [T]
    rlen2 = rlen2_ref[:, 0]
    T = rlen1.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, L), 1)
    in50 = iota < COMPLETE_COMPARE_REQUIRE
    rs2_main = rs2_ref[:, :L]
    s1_main = s1_ref[:, :L]

    def phase(carry, o, window, other, ol, valid):
        found, off_v, ol_v, diff_v = carry
        neq = window != other
        in_ol = iota < ol[:, None]
        full = jnp.sum(jnp.where(neq & in_ol, 1, 0), axis=1)
        d50 = jnp.sum(jnp.where(neq & in_ol & in50, 1, 0), axis=1)
        accept = (full < diff_limit) | \
            ((d50 < diff_limit) & (ol > COMPLETE_COMPARE_REQUIRE))
        take = (~found) & accept & valid
        return (found | take,
                jnp.where(take, o, off_v),
                jnp.where(take, ol, ol_v),
                jnp.where(take, full, diff_v))

    def body1(o, carry):
        window = s1_ref[:, pl.ds(o, L)]  # dynamic ref slice
        ol = jnp.maximum(jnp.minimum(rlen1 - o, rlen2), 0)
        valid = o < rlen1 - overlap_require
        return phase(carry, o, window, rs2_main, ol, valid)

    def body2(j, carry):
        window = rs2_ref[:, pl.ds(j, L)]
        ol = jnp.maximum(jnp.minimum(rlen1, rlen2 - j), 0)
        valid = j < rlen2 - overlap_require
        found, off_v, ol_v, diff_v = phase(carry, -j, window, s1_main, ol, valid)
        return (found, off_v, ol_v, diff_v)

    init = (jnp.zeros((T,), bool), jnp.zeros((T,), jnp.int32),
            jnp.zeros((T,), jnp.int32), jnp.zeros((T,), jnp.int32))
    O1 = max(L - overlap_require, 0)
    carry = jax.lax.fori_loop(0, O1, body1, init) if O1 > 0 else init
    O2 = max(L - overlap_require, 0)
    carry = jax.lax.fori_loop(0, O2, body2, carry) if O2 > 0 else carry
    found, off_v, ol_v, diff_v = carry

    found_ref[:, 0] = found.astype(jnp.int32)
    off_ref[:, 0] = jnp.where(found, off_v, 0)
    ol_ref[:, 0] = jnp.where(found, ol_v, 0)
    diff_ref[:, 0] = jnp.where(found, diff_v, 0)


def analyze_pallas(seq1: jnp.ndarray, rlen1: jnp.ndarray,
                   seq2: jnp.ndarray, rlen2: jnp.ndarray,
                   diff_limit: int, overlap_require: int,
                   interpret: bool = False) -> OverlapResult:
    """Pallas-fused overlap analysis; same contract as ``overlap.analyze``."""
    B, L1 = seq1.shape
    L2 = seq2.shape[1]
    L = max(L1, L2)
    rs2 = jnp.pad(reverse_complement(seq2, rlen2), ((0, 0), (0, 2 * L - L2)))
    s1 = jnp.pad(seq1, ((0, 0), (0, 2 * L - L1)))

    pad_b = (-B) % TILE
    if pad_b:
        s1 = jnp.pad(s1, ((0, pad_b), (0, 0)))
        rs2 = jnp.pad(rs2, ((0, pad_b), (0, 0)))
        rlen1 = jnp.pad(rlen1, (0, pad_b))
        rlen2 = jnp.pad(rlen2, (0, pad_b))
    Bp = B + pad_b

    grid = (Bp // TILE,)
    kernel = functools.partial(_kernel, L=L, diff_limit=diff_limit,
                               overlap_require=overlap_require)
    out_shape = [jax.ShapeDtypeStruct((Bp, 1), jnp.int32)] * 4
    row_spec = pl.BlockSpec((TILE, 2 * L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    found, off, ol, diff = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, len_spec, len_spec],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(s1, rs2, rlen1.astype(jnp.int32)[:, None], rlen2.astype(jnp.int32)[:, None])

    return OverlapResult((found[:B, 0] != 0), off[:B, 0], ol[:B, 0], diff[:B, 0])
