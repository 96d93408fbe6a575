"""FASTQ pack I/O.

The TPU pipeline consumes *packs*: struct-of-array batches with fixed-shape
``uint8[B, L]`` base/quality matrices plus per-read lengths, and host-side
name/strand byte strings.  This replaces the reference's per-read
``FqReader``/``Writer`` objects (reference: src/fqreader.cpp:160-195,
src/writer.cpp:81-92) with a vectorized, batch-oriented design.

Record-level parsing semantics follow the reference reader:
  * name lines: blank lines and lines not starting with '@' are skipped
    (fqreader.cpp:169-171);
  * missing quality is fabricated as 'K' * len (fqreader.cpp:179-181);
  * a quality/sequence length mismatch reports an error and terminates the
    stream (fqreader.cpp:184-191);
  * phred64 input is converted to phred33 clamped at 33 (read.h:71-75).
"""

from __future__ import annotations

import gzip
import io
import os
import sys
import zlib
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

DEFAULT_PACK_READS = 100000  # reference: options.h:21 maxReadsInPack


@dataclass
class ReadPack:
    """A batch of reads in struct-of-arrays form.

    ``names``/``strands`` keep the raw header lines (including the leading
    '@' / '+') for host-side string work; ``seq``/``qual`` are zero-padded
    ASCII byte matrices.
    """

    names: List[bytes]
    strands: List[bytes]
    seq: np.ndarray  # uint8 [B, L]
    qual: np.ndarray  # uint8 [B, L]
    lens: np.ndarray  # int32 [B]

    @property
    def count(self) -> int:
        return len(self.names)

    @property
    def width(self) -> int:
        return self.seq.shape[1]

    def read_seq(self, i: int, start: int = 0, length: Optional[int] = None) -> bytes:
        n = self.lens[i] if length is None else length
        return self.seq[i, start : start + n].tobytes()

    def read_qual(self, i: int, start: int = 0, length: Optional[int] = None) -> bytes:
        n = self.lens[i] if length is None else length
        return self.qual[i, start : start + n].tobytes()


def _round_width(n: int, multiple: int = 8) -> int:
    return max(multiple, -(-n // multiple) * multiple)


def make_pack(records: List[Tuple[bytes, bytes, bytes, bytes]], phred64: bool = False,
              width_multiple: int = 8) -> ReadPack:
    """Build a ReadPack from (name, seq, strand, qual) byte tuples."""
    if not records:
        return ReadPack([], [], np.zeros((0, 8), np.uint8), np.zeros((0, 8), np.uint8),
                        np.zeros((0,), np.int32))
    names = [r[0] for r in records]
    strands = [r[2] for r in records]
    seqs = [r[1] for r in records]
    quals = [r[3] for r in records]
    lens = np.fromiter((len(s) for s in seqs), count=len(seqs), dtype=np.int32)
    width = _round_width(int(lens.max(initial=0)), width_multiple)
    # np.array over 'S<width>' zero-pads each row -- a single C-level copy
    seq = np.frombuffer(np.array(seqs, dtype=f"S{width}").tobytes(), np.uint8).reshape(-1, width)
    qual = np.frombuffer(np.array(quals, dtype=f"S{width}").tobytes(), np.uint8).reshape(-1, width)
    if phred64:
        qual = np.where(qual > 0, np.maximum(qual.astype(np.int16) - 31, 33), 0).astype(np.uint8)
    return ReadPack(names, strands, seq, qual.copy(), lens)


class FastqStreamError(RuntimeError):
    pass


def _open_input(path: str):
    if path == "/dev/stdin":
        return sys.stdin.buffer
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def iter_records(path: str) -> Iterator[Tuple[bytes, bytes, bytes, bytes]]:
    """Yield (name, seq, strand, qual) raw byte tuples from a FASTQ file.

    Implements the reference's record recovery semantics (fqreader.cpp:160-195).
    """
    with _open_input(path) as fh:
        it = iter(fh)
        while True:
            # scan for a name line: skip blanks and non-'@' lines
            name = None
            for line in it:
                line = line.rstrip(b"\r\n")
                if line.startswith(b"@"):
                    name = line
                    break
            if name is None:
                return
            seq = next(it, None)
            strand = next(it, None)
            qual = next(it, None)
            if seq is None:
                return
            seq = seq.rstrip(b"\r\n")
            strand = b"" if strand is None else strand.rstrip(b"\r\n")
            if qual is None:
                # no quality: fabricate 'K' * len (fqreader.cpp:179-181)
                qual = b"K" * len(seq)
            else:
                qual = qual.rstrip(b"\r\n")
            if len(qual) != len(seq):
                sys.stderr.write(
                    "Error: base sequnce and quality sequence have different length: \n"
                    + name.decode("latin-1") + "\n" + seq.decode("latin-1") + "\n"
                    + qual.decode("latin-1") + "\n" + strand.decode("latin-1") + "\n"
                )
                return
            yield (name, seq, strand, qual)


def iter_packs(path: str, pack_reads: int = DEFAULT_PACK_READS, phred64: bool = False,
               width_multiple: int = 8) -> Iterator[ReadPack]:
    """Yield successive ReadPacks of up to ``pack_reads`` reads."""
    buf: List[Tuple[bytes, bytes, bytes, bytes]] = []
    for rec in iter_records(path):
        buf.append(rec)
        if len(buf) >= pack_reads:
            yield make_pack(buf, phred64, width_multiple)
            buf = []
    if buf:
        yield make_pack(buf, phred64, width_multiple)


def iter_packs_paired(path1: str, path2: str, interleaved: bool = False,
                      pack_reads: int = DEFAULT_PACK_READS, phred64: bool = False,
                      width_multiple: int = 8) -> Iterator[Tuple[ReadPack, ReadPack]]:
    """Yield (pack1, pack2) with equal counts; stops at the shorter stream
    (reference: fqreader.cpp:254-267 returns NULL when either side is out)."""
    if interleaved:
        def gen():
            it = iter_records(path1)
            while True:
                r1 = next(it, None)
                if r1 is None:
                    return
                r2 = next(it, None)
                if r2 is None:
                    return
                yield r1, r2
        pairs = gen()
    else:
        pairs = zip(iter_records(path1), iter_records(path2))

    buf1: List[Tuple[bytes, bytes, bytes, bytes]] = []
    buf2: List[Tuple[bytes, bytes, bytes, bytes]] = []
    for r1, r2 in pairs:
        buf1.append(r1)
        buf2.append(r2)
        if len(buf1) >= pack_reads:
            yield make_pack(buf1, phred64, width_multiple), make_pack(buf2, phred64, width_multiple)
            buf1, buf2 = [], []
    if buf1:
        yield make_pack(buf1, phred64, width_multiple), make_pack(buf2, phred64, width_multiple)


class OutputWriter:
    """Streaming FASTQ output, gzip when the filename ends with .gz.

    Mirrors the reference Writer (src/writer.cpp:30-60): compression level from
    options, 1 MiB buffering.
    """

    def __init__(self, path: str, compression: int = 3):
        self.path = path
        self._gz = path.endswith(".gz")
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._fh = open(path, "wb", buffering=1 << 20)
        if self._gz:
            # raw gzip stream via zlib for speed; wbits=31 => gzip container
            self._comp = zlib.compressobj(compression, zlib.DEFLATED, 31)
        else:
            self._comp = None

    def write(self, data: bytes) -> None:
        if not data:
            return
        if self._comp is not None:
            out = self._comp.compress(data)
            if out:
                self._fh.write(out)
        else:
            self._fh.write(data)

    def close(self) -> None:
        if self._fh is None:
            return
        if self._comp is not None:
            self._fh.write(self._comp.flush(zlib.Z_FINISH))
            self._comp = None
        self._fh.close()
        self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def format_record(name: bytes, seq: bytes, strand: bytes, qual: bytes,
                  tag: Optional[bytes] = None) -> bytes:
    """4-line FASTQ serialization (reference: read.h:166-176)."""
    if tag is not None:
        name = name + b" " + tag
    return b"%s\n%s\n%s\n%s\n" % (name, seq, strand, qual)
