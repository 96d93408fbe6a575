"""Overlap-analysis backend selection.

Three bit-identical implementations exist (cross-validated in
tests/test_overlap_mxu.py and tests/test_pallas2.py):

  * ``overlap.analyze`` -- jnp accept scan with the offset axis on the
    128-lane minor dimension and an O(B*offsets) long-read lowering
    (ops/overlap.py::_phase_scan50).  The default: ~20x faster on v5e than
    the round-2 window stack, and chunks no longer shrink with read width.
  * ``pallas_overlap2.analyze_pallas2`` -- fused Mosaic kernel restricted to
    the constructs that compile on current libtpu builds (int32 compares,
    static slices, no bool loop carries).  Keeps only one [TILE, 2L] plane
    in VMEM.  Superseded as a deployment path by the jnp rewrite (which it
    no longer beats anywhere measured) but kept as the cross-validated
    Mosaic reference; opt in with FQTOOL_TPU_PALLAS=1.
  * ``overlap.analyze_mxu`` -- grouped-conv formulation kept as a reference
    for backends with fast batched correlation.

Selection probes the Pallas kernel on first use and falls back to jnp
permanently if the backend cannot compile it.
"""

from __future__ import annotations

import os
import sys

from . import overlap

_pallas_state = {"ok": None}  # None = unprobed


def use_pallas() -> bool:
    return os.environ.get("FQTOOL_TPU_PALLAS") == "1"


def probe_pallas() -> bool:
    """Try compiling the fused kernel on the active backend (tiny shape)."""
    if _pallas_state["ok"] is None:
        import jax
        import numpy as np

        from .pallas_overlap2 import analyze_pallas2
        try:
            seq = np.full((8, 40), ord("A"), np.uint8)
            rl = np.full(8, 40, np.int32)
            r = jax.jit(lambda a, b: analyze_pallas2(a, b, seq, rl, 5, 30)
                        )(seq, rl)
            np.asarray(r.overlapped)
            _pallas_state["ok"] = True
        except Exception as e:  # pragma: no cover - backend-dependent
            sys.stderr.write(
                f"pallas overlap kernel unavailable ({type(e).__name__}); "
                "using the jnp path\n")
            _pallas_state["ok"] = False
    return _pallas_state["ok"]


def analyze(seq1, rlen1, seq2, rlen2, diff_limit, overlap_require):
    if use_pallas() and probe_pallas():
        from .pallas_overlap2 import analyze_pallas2

        return analyze_pallas2(seq1, rlen1, seq2, rlen2,
                               diff_limit, overlap_require)
    return overlap.analyze(seq1, rlen1, seq2, rlen2,
                           diff_limit, overlap_require)
