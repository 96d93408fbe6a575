"""Parallel gzip OutputWriter: stitched-member validity and determinism.

The writer deflates 1 MiB blocks concurrently on the shared pool and
stitches them into ONE gzip member (Z_FULL_FLUSH boundaries + final empty
Z_FINISH block + crc32/isize trailer).  Since round 3 every write() call is
ALSO a block boundary: a pack's compressed bytes depend only on the pack,
which is what lets multi-host ranks deflate their packs independently and
rank 0 merge by concatenation (dist/multihost.py).  The compressed bytes
are never compared against the oracle (only decompressed records are), but
they must round-trip through any zlib reader, be deterministic for a given
sequence of write() calls, and decompress identically regardless of call
boundaries.
"""

import gzip
import zlib

import numpy as np
import pytest

from fqtool_tpu.io.fastq import OutputWriter


def _write(path, chunks, level=3):
    w = OutputWriter(str(path), level)
    for c in chunks:
        w.write(c)
    w.close()
    return path.read_bytes()


def test_roundtrip_and_determinism(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(32, 127, 5 * (1 << 20) + 12345, dtype=np.uint8).tobytes()
    a = _write(tmp_path / "a.gz", [data])
    # same write-call sequence => identical file bytes (determinism)
    a2 = _write(tmp_path / "a2.gz", [data])
    assert a == a2
    # different call boundaries => different block framing (by design since
    # round 3: calls are block boundaries) but identical decompressed bytes
    cuts = sorted(rng.integers(0, len(data), 7).tolist())
    parts = [data[i:j] for i, j in zip([0] + cuts, cuts + [len(data)])]
    b = _write(tmp_path / "b.gz", parts + [b""])
    assert gzip.decompress(b) == data
    assert gzip.decompress(a) == data
    # single-member stream: a strict zlib reader consumes it in one go
    for blob in (a, b):
        d = zlib.decompressobj(wbits=31)
        assert d.decompress(blob) == data and d.eof


def test_empty_and_tiny(tmp_path):
    assert gzip.decompress(_write(tmp_path / "e.gz", [])) == b""
    assert gzip.decompress(_write(tmp_path / "t.gz", [b"x"])) == b"x"


@pytest.mark.parametrize("level", [1, 9])
def test_levels(tmp_path, level):
    data = b"ACGT" * 300_000
    out = _write(tmp_path / "l.gz", [data], level=level)
    assert gzip.decompress(out) == data


def test_plain_passthrough(tmp_path):
    p = tmp_path / "plain.fq"
    w = OutputWriter(str(p), 3)
    w.write(b"@r\nACGT\n+\nIIII\n")
    w.close()
    assert p.read_bytes() == b"@r\nACGT\n+\nIIII\n"
