"""Mosaic-compatible fused Pallas overlap kernel.

The original fused kernel (ops/pallas_overlap.py) uses constructs that crash
the Mosaic backend shipped with some libtpu builds (empirically bisected on
v5e remote-compile: 8-bit vector compares/min/max, bool vectors as fori_loop
carries, dynamic lane slices / pltpu.roll).  This variant restricts itself to
the proven-compiling subset:

  * inputs pre-widened to int32 (compares on int32 vectors compile);
  * the offset scan fully unrolled in Python with STATIC lane slices over a
    [T, 2L] padded plane (no dynamic slicing);
  * first-accept folding with int32 masks carried as ordinary traced values
    (no lax loops, no bool carries).

Semantics identical to ``OverlapAnalysis::analyze`` (reference:
src/overlapanalysis.cpp:7-72) and to ops/overlap.py `analyze`; validated in
interpret mode and cross-checked against the jnp path in tests.  Runtime
selection with automatic fallback lives in ops/overlap_select.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .overlap import COMPLETE_COMPARE_REQUIRE, OverlapResult, reverse_complement

TILE = 256  # reads per grid step


def _kernel(s1_ref, rs2_ref, rlen1_ref, rlen2_ref,
            found_ref, off_ref, ol_ref, diff_ref,
            *, L, diff_limit, overlap_require):
    rlen1 = rlen1_ref[:, 0]                     # [T] int32
    rlen2 = rlen2_ref[:, 0]
    T = rlen1.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, L), 1)
    in50 = iota < COMPLETE_COMPARE_REQUIRE
    s1_main = s1_ref[:, :L]
    rs2_main = rs2_ref[:, :L]

    found = jnp.zeros((T,), jnp.int32)
    off_v = jnp.zeros((T,), jnp.int32)
    ol_v = jnp.zeros((T,), jnp.int32)
    diff_v = jnp.zeros((T,), jnp.int32)

    def step(carry, o_val, window, other, ol, valid):
        found, off_v, ol_v, diff_v = carry
        neq = (window - other) != 0
        in_ol = iota < ol[:, None]
        full = jnp.sum(jnp.where(neq & in_ol, 1, 0), axis=1)
        d50 = jnp.sum(jnp.where(neq & in_ol & in50, 1, 0), axis=1)
        accept = (full < diff_limit) | \
            ((d50 < diff_limit) & (ol > COMPLETE_COMPARE_REQUIRE))
        take = jnp.where(accept & valid & (found == 0), 1, 0)
        return (found | take,
                jnp.where(take == 1, o_val, off_v),
                jnp.where(take == 1, ol, ol_v),
                jnp.where(take == 1, full, diff_v))

    carry = (found, off_v, ol_v, diff_v)
    O = max(L - overlap_require, 0)
    # phase 1: offset o >= 0, compare s1[o+i] vs rs2[i] (static slices,
    # fully unrolled)
    for o in range(O):
        window = s1_ref[:, o : o + L]
        ol = jnp.maximum(jnp.minimum(rlen1 - o, rlen2), 0)
        valid = o < (rlen1 - overlap_require)
        carry = step(carry, o, window, rs2_main, ol, valid)
    # phase 2: offset -j, compare s1[i] vs rs2[j+i]
    for j in range(O):
        window = rs2_ref[:, j : j + L]
        ol = jnp.maximum(jnp.minimum(rlen1, rlen2 - j), 0)
        valid = j < (rlen2 - overlap_require)
        carry = step(carry, -j, window, s1_main, ol, valid)

    found, off_v, ol_v, diff_v = carry
    hit = found != 0
    found_ref[:, 0] = found
    off_ref[:, 0] = jnp.where(hit, off_v, 0)
    ol_ref[:, 0] = jnp.where(hit, ol_v, 0)
    diff_ref[:, 0] = jnp.where(hit, diff_v, 0)


def analyze_pallas2(seq1: jnp.ndarray, rlen1: jnp.ndarray,
                    seq2: jnp.ndarray, rlen2: jnp.ndarray,
                    diff_limit: int, overlap_require: int,
                    interpret: bool = False) -> OverlapResult:
    """Same contract as ``overlap.analyze``."""
    B, L1 = seq1.shape
    L2 = seq2.shape[1]
    L = max(L1, L2)
    rs2 = jnp.pad(reverse_complement(seq2, rlen2).astype(jnp.int32),
                  ((0, 0), (0, 2 * L - L2)))
    s1 = jnp.pad(seq1.astype(jnp.int32), ((0, 0), (0, 2 * L - L1)))

    pad_b = (-B) % TILE
    if pad_b:
        s1 = jnp.pad(s1, ((0, pad_b), (0, 0)))
        rs2 = jnp.pad(rs2, ((0, pad_b), (0, 0)))
        rlen1 = jnp.pad(rlen1, (0, pad_b))
        rlen2 = jnp.pad(rlen2, (0, pad_b))
    Bp = B + pad_b

    kernel = functools.partial(_kernel, L=L, diff_limit=diff_limit,
                               overlap_require=overlap_require)
    row_spec = pl.BlockSpec((TILE, 2 * L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    found, off, ol, diff = pl.pallas_call(
        kernel,
        grid=(Bp // TILE,),
        in_specs=[row_spec, row_spec, len_spec, len_spec],
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((Bp, 1), jnp.int32)] * 4,
        interpret=interpret,
    )(s1, rs2, rlen1.astype(jnp.int32)[:, None], rlen2.astype(jnp.int32)[:, None])

    return OverlapResult((found[:B, 0] != 0), off[:B, 0], ol[:B, 0], diff[:B, 0])
