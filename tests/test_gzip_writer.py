"""Parallel gzip OutputWriter: stitched-member validity and determinism.

The writer deflates 1 MiB blocks concurrently on the shared pool and
stitches them into ONE gzip member (Z_FULL_FLUSH boundaries + final empty
Z_FINISH block + crc32/isize trailer).  The compressed bytes are never
compared against the oracle (only decompressed records are), but they must
round-trip through any zlib reader and be a deterministic function of the
written byte stream regardless of write() call boundaries.
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
    # same bytes, different write boundaries => identical file bytes
    a = _write(tmp_path / "a.gz", [data])
    cuts = sorted(rng.integers(0, len(data), 7).tolist())
    parts = [data[i:j] for i, j in zip([0] + cuts, cuts + [len(data)])]
    b = _write(tmp_path / "b.gz", parts + [b""])
    assert a == b
    assert gzip.decompress(a) == data
    # single-member stream: a strict zlib reader consumes it in one go
    d = zlib.decompressobj(wbits=31)
    assert d.decompress(a) == data and d.eof


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
