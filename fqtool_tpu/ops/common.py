"""Shared vectorized primitives for the per-read kernels.

All kernels operate on left-aligned batches: ``seq``/``qual`` are
``uint8[B, L]`` ASCII matrices, ``rlen`` is ``int32[B]``.  Data-dependent
early-exit loops from the reference become evaluate-everywhere + first/last
true-index selections, which map cleanly onto the TPU VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ASCII codes
A, C, G, T, N = 65, 67, 71, 84, 78
Q20_CHAR = ord("5")  # reference: stats.cpp:250
Q30_CHAR = ord("?")  # reference: stats.cpp:251

import numpy as np

# base -> 2-bit code used by seq2int (reference: evaluator.cpp:3-49):
# A=0, T=1, C=2, G=3, everything else invalid.
# NOTE: these lookup tables must be HOST (numpy) arrays: a module-level
# device array would be closed over as a jaxpr constant and lowering would
# fetch its value from the device mid-dispatch, which deadlocks remote
# attachments.
_SEQ2INT_LUT = np.full((256,), -1, dtype=np.int8)
for _b, _v in ((A, 0), (T, 1), (C, 2), (G, 3)):
    _SEQ2INT_LUT[_b] = _v

# base -> complement (reference: seq.h:24-48 / util complement): other -> N
_COMPLEMENT_LUT = np.full((256,), N, dtype=np.uint8)
for _src, _dst in ((A, T), (ord("a"), T), (T, A), (ord("t"), A),
                   (C, G), (ord("c"), G), (G, C), (ord("g"), C)):
    _COMPLEMENT_LUT[_src] = _dst


def seq2int_codes(seq: jnp.ndarray) -> jnp.ndarray:
    """Map ASCII bases to 2-bit codes; -1 marks invalid bases."""
    return jnp.asarray(_SEQ2INT_LUT)[seq.astype(jnp.int32)]


def complement(seq: jnp.ndarray) -> jnp.ndarray:
    return jnp.asarray(_COMPLEMENT_LUT)[seq.astype(jnp.int32)]


def positions(n: int) -> jnp.ndarray:
    """[1, n] int32 position row for broadcasting against [B, 1] scalars."""
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def first_true(mask: jnp.ndarray, default) -> jnp.ndarray:
    """Per-row index of the first True along the last axis, else ``default``.

    ``default`` may be a scalar or a [B]-shaped array.
    """
    found = jnp.any(mask, axis=-1)
    idx = jnp.argmax(mask, axis=-1).astype(jnp.int32)
    return jnp.where(found, idx, default)


def last_true(mask: jnp.ndarray, default) -> jnp.ndarray:
    """Per-row index of the last True along the last axis, else ``default``."""
    n = mask.shape[-1]
    found = jnp.any(mask, axis=-1)
    idx = (n - 1) - jnp.argmax(mask[..., ::-1], axis=-1).astype(jnp.int32)
    return jnp.where(found, idx, default)


def valid_mask(rlen: jnp.ndarray, width: int) -> jnp.ndarray:
    """[B, width] mask of positions < rlen."""
    return positions(width) < rlen[:, None]


def align(seq: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    """Left-align each row at ``start`` (gather); positions past the end read
    whatever padding is there -- callers must mask by the new length."""
    width = seq.shape[1]
    idx = jnp.minimum(start[:, None] + positions(width), width - 1)
    return jnp.take_along_axis(seq, idx, axis=1)


def prefix_sums(x: jnp.ndarray) -> jnp.ndarray:
    """[B, L] -> [B, L+1] exclusive prefix sums in int32."""
    c = jnp.cumsum(x.astype(jnp.int32), axis=1)
    return jnp.pad(c, ((0, 0), (1, 0)))
