"""Pre-processing evaluation passes.

Host-side port of the Evaluator (reference: src/evaluator.cpp): read-length
estimation, read-number estimation, overrepresented-sequence seeding, and
adapter auto-detection (10-mer seed histogram + nucleotide-tree extension +
known-adapter prefix matching).

These passes scan bounded prefixes of the input once each and run at startup;
they stay on host (numpy) by design.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

from ..config.options import Options
from ..io.fastq import iter_records
from .known_adapters import KNOWN_ADAPTERS
from .nucleotidetree import NucleotideTree

_BASE_VAL = {65: 0, 84: 1, 67: 2, 71: 3}  # A T C G


def seq2int(seq: str, pos: int, keylen: int) -> int:
    """2-bit packing; -1 when any base is not A/T/C/G
    (reference: src/evaluator.cpp:3-49)."""
    key = 0
    for i in range(pos, pos + keylen):
        v = _BASE_VAL.get(ord(seq[i])) if i < len(seq) else None
        if v is None:
            return -1
        key = (key << 2) + v
    return key


def int2seq(val: int, seq_len: int) -> str:
    """reference: src/evaluator.cpp:51-61"""
    bases = "ATCG"
    out = ["N"] * seq_len
    for index in range(seq_len):
        out[seq_len - index - 1] = bases[val & 0x03]
        val >>= 2
    return "".join(out)


def evaluate_read_len(opt: Options) -> None:
    """reference: src/evaluator.cpp:84-109"""
    if opt.in1:
        opt.est.seq_len1 = compute_read_len(opt.in1)
    if opt.in2:
        opt.est.seq_len2 = compute_read_len(opt.in2)


def compute_read_len(filename: str) -> int:
    seq_len = 0
    for i, (_, seq, _, _) in enumerate(iter_records(filename)):
        if i >= 1000:
            break
        seq_len = max(seq_len, len(seq))
    return seq_len


def evaluate_read_num(opt: Options) -> None:
    """Estimate the total read count from bytes/read over a bounded prefix
    (reference: src/evaluator.cpp:191-227).

    The reference measures *compressed* offsets via gzoffset for .gz inputs;
    we track consumed bytes of the underlying raw stream, which matches to
    within the readahead granularity.  The estimate feeds only ``--split``
    sizing and carries the reference's own x1.01 fudge.
    """
    import gzip

    READ_LIMIT = 512 * 1024
    BASE_LIMIT = 151 * 512 * 1024
    path = opt.in1
    bytes_total = os.path.getsize(path)

    raw = open(path, "rb")
    counted = _CountingReader(raw)
    fh = gzip.GzipFile(fileobj=counted) if path.endswith(".gz") else counted

    records = 0
    bases = 0
    first_read_pos = 0
    reached_eof = False
    try:
        it = _iter_records_fh(fh)
        while records < READ_LIMIT and bases < BASE_LIMIT:
            rec = next(it, None)
            if rec is None:
                reached_eof = True
                break
            if records == 0:
                first_read_pos = counted.consumed
            records += 1
            bases += len(rec[1])
    finally:
        raw.close()

    opt.est.reads_num = 0
    if reached_eof:
        opt.est.reads_num = records
    elif records > 1:
        bytes_read = counted.consumed
        bytes_per_read = (bytes_read - first_read_pos) / (records - 1)
        opt.est.reads_num = int(bytes_total * 1.01 / bytes_per_read)


class _CountingReader:
    def __init__(self, fh):
        self._fh = fh
        self.consumed = 0

    def read(self, n=-1):
        data = self._fh.read(n)
        self.consumed += len(data)
        return data

    def readline(self, n=-1):
        data = self._fh.readline(n)
        self.consumed += len(data)
        return data

    def readable(self):
        return True

    def seekable(self):
        return False


def _iter_records_fh(fh):
    while True:
        name = None
        while True:
            line = fh.readline()
            if not line:
                return
            line = line.rstrip(b"\r\n")
            if line.startswith(b"@"):
                name = line
                break
        seq = fh.readline().rstrip(b"\r\n")
        strand = fh.readline().rstrip(b"\r\n")
        qual = fh.readline().rstrip(b"\r\n")
        yield name, seq, strand, qual


# ----------------------------------------------------------------------
# Overrepresented sequence seeding (reference: evaluator.cpp:111-189)

def evaluate_over_rep_seqs(opt: Options) -> None:
    if opt.in1:
        opt.over_rep.over_rep_seq_count_r1 = compute_over_rep_seq(opt.in1)
    if opt.in2:
        opt.over_rep.over_rep_seq_count_r2 = compute_over_rep_seq(opt.in2)


def compute_over_rep_seq(filename: str) -> Dict[str, int]:
    """reference: src/evaluator.cpp:120-189"""
    BASE_LIMIT = 151 * 10000
    steps = sorted({10, 20, 40, 100, min(150, 151 - 2)})
    seq_counts: Dict[str, int] = defaultdict(int)
    bases = 0
    for name, seq, strand, qual in iter_records(filename):
        if bases >= BASE_LIMIT:
            break
        s = seq.decode("latin-1")
        rlen = len(s)
        bases += rlen
        for step in steps:
            for i in range(0, rlen - step):
                seq_counts[s[i : i + step]] += 1

    hot: Dict[str, int] = {}
    for s, count in seq_counts.items():
        n = len(s)
        if ((n >= 151 - 1 and count >= 3) or (n >= 100 and count >= 5)
                or (n >= 40 and count >= 20) or (n >= 20 and count >= 100)
                or (n >= 10 and count >= 500)):
            hot[s] = count

    # drop substrings of kept superstrings with similar counts
    # (evaluator.cpp:166-188); iterate over a sorted snapshot for determinism
    # (std::map iterates in lexicographic order)
    removed = set()
    items = sorted(hot.items())
    for s, count in items:
        for s2, count2 in items:
            if s != s2 and s2 not in removed and s in s2 and count // count2 < 10:
                removed.add(s)
                break
    for s in removed:
        del hot[s]
    return hot


# ----------------------------------------------------------------------
# Adapter auto-detection (reference: evaluator.cpp:229-446)

def evaluate_adapter_seq(opt: Options, is_r2: bool) -> None:
    filename = opt.in2 if is_r2 else opt.in1
    detected = detect_adapter(filename, opt.trim.tail1)
    if is_r2:
        opt.adapter.detected_adapter_seq_r2 = detected
        if detected and detected in KNOWN_ADAPTERS:
            opt.est.illumina_adapter = True
    else:
        opt.adapter.detected_adapter_seq_r1 = detected
        if detected and detected in KNOWN_ADAPTERS:
            opt.est.illumina_adapter = True


def detect_adapter(filename: str, trim_tail1: int) -> str:
    """reference: src/evaluator.cpp:229-390"""
    READ_LIMIT = 256 * 1024
    BASE_LIMIT = 151 * READ_LIMIT
    keylen = 10
    size = 1 << (keylen * 2)

    records = _load_record_seqs(filename, READ_LIMIT, BASE_LIMIT)

    if len(records) < 10000:
        return ""

    shift_tail = max(1, trim_tail1)
    counts = _count_seed_kmers(records, keylen, shift_tail)

    counts[0] = 0  # zero the poly-A key (evaluator.cpp:284)
    topkeys, total = _top_keys(counts, keylen)

    FOLD_THRESHOLD = 20
    for key in topkeys:
        if key == 0:
            continue
        seq = int2seq(key, keylen)
        count = int(counts[key])
        if count < 10 or count * size < total * FOLD_THRESHOLD:
            break  # evaluator.cpp:348 (break, not continue)
        # low-complexity re-check (evaluator.cpp:350-359)
        diff = sum(1 for i in range(len(seq) - 1) if seq[i] != seq[i + 1])
        if diff < 3:
            continue
        est = _get_adapter_with_seed(key, records, keylen, trim_tail1)
        if est:
            return est
    return ""


def _load_record_seqs(filename: str, read_limit: int, base_limit: int) -> List[str]:
    """Load up to read_limit/base_limit sequences; uses the native pack
    reader when available (the python per-record path is the startup
    bottleneck for large detection scans)."""
    from ..io.fastq import PackReader

    reader = PackReader(filename, pack_reads=min(read_limit, 65536))
    out: List[str] = []
    bases = 0
    while len(out) < read_limit and bases < base_limit:
        pack = reader.next_pack()
        if pack is None:
            break
        lens = np.asarray(pack.lens)
        # bulk-decode rows: strip the zero padding per row
        flat = pack.seq.tobytes().decode("latin-1")
        w = pack.width
        for i in range(pack.count):
            if len(out) >= read_limit or bases >= base_limit:
                break
            n = int(lens[i])
            out.append(flat[i * w : i * w + n])
            bases += n
    return out


def _count_seed_kmers(records: List[str], keylen: int, shift_tail: int) -> np.ndarray:
    """10-mer histogram over positions >= 20 (evaluator.cpp:273-282),
    vectorized with numpy over the whole record block."""
    size = 1 << (keylen * 2)
    counts = np.zeros(size, np.int64)
    # bucket records by length for vectorization
    by_len: Dict[int, List[str]] = defaultdict(list)
    for r in records:
        by_len[len(r)].append(r)
    lut = np.full(256, -1, np.int64)
    for b, v in _BASE_VAL.items():
        lut[b] = v
    for rlen, rs in by_len.items():
        # positions pos in [20, rlen - keylen - shift_tail]
        last = rlen - keylen - shift_tail
        if last < 20:
            continue
        arr = np.frombuffer("".join(rs).encode("latin-1"), np.uint8).reshape(len(rs), rlen)
        codes = lut[arr]
        npos = last - 20 + 1
        keys = np.zeros((len(rs), npos), np.int64)
        ok = np.ones((len(rs), npos), bool)
        for j in range(keylen):
            c = codes[:, 20 + j : 20 + j + npos]
            keys = keys * 4 + np.maximum(c, 0)
            ok &= c >= 0
        np.add.at(counts, keys[ok], 1)
    return counts


def _top_keys(counts: np.ndarray, keylen: int) -> Tuple[List[int], int]:
    """Top-10 seed selection with the reference's complexity/GC/GGGG-prefix
    exclusions and its quirky insertion order (evaluator.cpp:287-337)."""
    size = counts.shape[0]
    ks = np.arange(size, dtype=np.int64)
    atcg = np.zeros((4, size), np.int16)
    for i in range(keylen):
        b = (ks >> (i * 2)) & 0x3
        for v in range(4):
            atcg[v] += b == v
    low_complexity = (atcg >= keylen - 4).any(axis=0)
    high_gc = (atcg[2] + atcg[3]) >= keylen - 2
    gggg_prefix = (ks >> 12) == 0xFF
    eligible = ~(low_complexity | high_gc | gggg_prefix)

    total = int(counts[eligible].sum())

    # Reproduce the reference's exact insertion loop over ascending k.  It has
    # a quirk: a value that beats the current top (t == 0 branch) shifts and
    # inserts at 0, but a value beating position t>0 inserts at t+1.
    topnum = 10
    topkeys = [0] * topnum

    # only keys with nonzero count (plus the implicit zeros) can matter
    candidates = ks[eligible & (counts > 0)]
    for k in candidates.tolist():
        val = counts[k]
        for t in range(topnum - 1, -1, -1):
            if val < counts[topkeys[t]]:
                if t < topnum - 1:
                    for m in range(topnum - 1, t + 1, -1):
                        topkeys[m] = topkeys[m - 1]
                    topkeys[t + 1] = k
                break
            elif t == 0:
                for m in range(topnum - 1, t, -1):
                    topkeys[m] = topkeys[m - 1]
                topkeys[t] = k
    return topkeys, total


def _get_adapter_with_seed(seed: int, records: List[str], keylen: int,
                           trim: int) -> str:
    """reference: src/evaluator.cpp:392-426"""
    shift_tail = max(1, trim)
    forward = NucleotideTree()
    backward = NucleotideTree()
    seed_seq = int2seq(seed, keylen)
    for r in records:
        last = len(r) - keylen - shift_tail
        pos = r.find(seed_seq, 20)
        while 0 <= pos <= last:
            forward.add_seq(r[pos + keylen : len(r) - shift_tail])
            backward.add_seq(r[:pos][::-1])
            pos = r.find(seed_seq, pos + 1)

    reached1 = forward.get_dominant_path()
    reached2 = backward.get_dominant_path()
    forward_path, f_leaf = reached1
    backward_path, b_leaf = reached2
    reached_leaf = f_leaf and b_leaf
    adapter = backward_path[::-1] + seed_seq + forward_path
    if len(adapter) > 60:
        adapter = adapter[:60]
    matched = match_known_adapter(adapter)
    if matched:
        return matched
    return adapter if reached_leaf else ""


def match_known_adapter(seq: str) -> str:
    """Exact-prefix match against the known adapter DB
    (reference: src/evaluator.cpp:428-446)."""
    for adapter in KNOWN_ADAPTERS:
        if len(seq) < len(adapter):
            continue
        if seq.startswith(adapter):
            return adapter
    return ""
