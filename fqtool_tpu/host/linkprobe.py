"""Transport auto-tuning.

The packed one-byte transport (ops/packed.py) halves host->device upload
bytes at the cost of one host encode pass (~GB/s).  Whether that trades well
depends entirely on the attachment: a local PCIe/ICI link moves tens of GB/s
and the encode pass is pure loss, while a WAN-tunneled remote chip moves
20-100 MB/s and upload dominates the whole pipeline (the reference has no
analog -- its reader hands strings to pthread workers in the same address
space, src/fqreader.cpp:160-195).

``use_packed()`` decides once per process: ``FQTOOL_TPU_PACKED=1/0``
forces the choice, otherwise a one-shot 4 MiB device_put + fetch measures
the link and enables packing below ``PACKED_THRESHOLD_MBPS`` of combined
roundtrip bandwidth.  The probe is pure transfer -- no jit compilation --
so it costs milliseconds locally and well under a second on slow tunnels.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

PACKED_THRESHOLD_MBPS = 400.0
_PROBE_BYTES = 4 << 20

_cached: bool | None = None


def _probe_mbps() -> float:
    import jax

    buf = np.zeros((_PROBE_BYTES,), np.uint8)
    # warm the transfer path (lazy backend init, pinned buffers)
    np.asarray(jax.device_put(buf))
    t0 = time.perf_counter()
    np.asarray(jax.device_put(buf))
    dt = max(time.perf_counter() - t0, 1e-9)
    return (2 * _PROBE_BYTES / (1 << 20)) / dt


def use_packed() -> bool:
    """True when seq+qual chunks should ride the packed one-byte transport."""
    global _cached
    env = os.environ.get("FQTOOL_TPU_PACKED", "")
    if env == "1":
        return True
    if env == "0":
        return False
    if _cached is None:
        try:
            mbps = _probe_mbps()
        except Exception:
            _cached = False
            return False
        _cached = mbps < PACKED_THRESHOLD_MBPS
        if _cached:
            sys.stderr.write(
                f"[fqtool_tpu] link probe {mbps:.0f} MB/s roundtrip -> "
                "packed transport enabled\n")
    return _cached
