"""Packed seq+qual transport encoding.

The host->device link is the throughput bottleneck of the whole pipeline on
remote-attached TPUs (measured 20-50 MB/s with ~100-200 ms per-message
latency), and the two uint8 matrices per read side (sequence + quality) are
by far the largest payload.  For real FASTQ data both fit in ONE byte per
base:

    enc = code(base) + 5 * (qual - 33)        code: A=0 C=1 G=2 T=3 N=4
    pad = 250 (above every valid code, 4 + 5*49 = 249)

which is valid whenever every base is A/C/G/T/N and every quality is in
[33, 82] ('!' .. 'R') -- all Illumina and phred64-converted data.  The host
encoder is a single 256x256 LUT gather whose invalid cells hold 255, so
validation is one ``max()`` reduction; it returns None for anything outside
the alphabet (lowercase bases, exotic bytes, quality > 'R') and the runner
falls back to the raw two-matrix path, so the encoding is a pure transport
optimization with no semantic surface.

The device decoder reconstructs the exact ASCII bytes with elementwise
arithmetic and a 6-way select (no gathers), so every downstream kernel sees
byte-identical inputs.  This halves upload bytes and roughly doubles
end-to-end throughput on tunnel-attached chips (there is no reference
counterpart: fqtool's reader hands `std::string`s to pthread workers,
src/fqreader.cpp:160-195).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .common import A, C, G, N, T

QUAL_MIN = 33
QUAL_MAX = 33 + 49  # code + 5*49 = 249 < PAD
PAD = 250
_INVALID = 255

# (base byte, qual byte) -> encoded byte; one gather pass + one max() check
# instead of the ~6 elementwise validation passes of the scalar formulation
# (the encode pass sits on the critical dispatch path of every chunk)
_ENC_LUT = np.full((256, 256), _INVALID, np.uint8)
_ENC_LUT[0, 0] = PAD  # seq pad and qual pad must agree
for _i, _ch in enumerate(b"ACGTN"):
    for _q in range(QUAL_MIN, QUAL_MAX + 1):
        _ENC_LUT[_ch, _q] = _i + 5 * (_q - QUAL_MIN)


def encode_host(seq: np.ndarray, qual: np.ndarray) -> Optional[np.ndarray]:
    """Encode a zero-padded ASCII (seq, qual) pair into one uint8 matrix, or
    None when the content is outside the encodable alphabet/quality range."""
    enc = _ENC_LUT[seq, qual]
    if int(enc.max(initial=0)) == _INVALID:
        return None
    return enc


def decode_device(enc: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of :func:`encode_host`, on device: elementwise arithmetic plus
    a 6-way select -- no gathers."""
    pad = enc == PAD
    q33 = enc // np.uint8(5)          # 0..49 (pad: 50)
    code = enc - q33 * np.uint8(5)    # 0..4 (pad: 0)
    qual = jnp.where(pad, np.uint8(0), q33 + np.uint8(QUAL_MIN)).astype(jnp.uint8)
    seq = jnp.select(
        [pad, code == 0, code == 1, code == 2, code == 3],
        [np.uint8(0), np.uint8(A), np.uint8(C), np.uint8(G), np.uint8(T)],
        np.uint8(N)).astype(jnp.uint8)
    return seq, qual
