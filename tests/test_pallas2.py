"""Mosaic-compatible fused overlap kernel: equivalence vs the jnp path
(interpret mode on CPU; the same kernel compiles and matches on real v5e,
see BENCHMARKS.md)."""

from __future__ import annotations

import numpy as np
import pytest

from fqtool_tpu.ops import overlap as O
from fqtool_tpu.ops.pallas_overlap2 import analyze_pallas2


@pytest.mark.parametrize("seed,l1,l2", [(0, 64, 64), (1, 96, 72), (2, 48, 96)])
def test_pallas2_matches_jnp(seed, l1, l2):
    rng = np.random.default_rng(seed)
    B = 64
    seq1 = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(B, l1)).astype(np.uint8)
    seq2 = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(B, l2)).astype(np.uint8)
    rlen1 = rng.integers(31, l1 + 1, B).astype(np.int32)
    rlen2 = rng.integers(31, l2 + 1, B).astype(np.int32)
    # embed true overlaps for half the batch: seq2 tail = revcomp of seq1 head
    comp = {65: 84, 84: 65, 67: 71, 71: 67, 78: 78}
    for b in range(0, B, 2):
        n1, n2 = int(rlen1[b]), int(rlen2[b])
        ov = min(40, n1, n2)
        for i in range(ov):
            seq2[b, n2 - 1 - i] = comp[int(seq1[b, i])]

    ref = O.analyze(seq1, rlen1, seq2, rlen2, 5, 30)
    got = analyze_pallas2(seq1, rlen1, seq2, rlen2, 5, 30, interpret=True)
    for name, a, b in zip(("overlapped", "offset", "overlap_len", "diff"),
                          ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
