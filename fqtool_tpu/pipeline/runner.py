"""Host-side processing runtime.

Replaces the reference's producer/consumer pthread architecture
(reference: src/seprocessor.cpp, src/peprocessor.cpp) with a pack-streaming
loop: the host reads packs, ships them to the device pipeline, and
materializes output records + report accumulators from the returned index
arithmetic.  Output record order is always input order (matching the
reference run with one worker thread).
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Optional

import numpy as np

import jax

from ..config.options import Options
from ..host import report_json
from ..host.duplicate import DuplicateTable
from ..host.filterresult import FilterResultAccumulator
from ..host.stats import StatsAccumulator
from ..host.tracing import device_profile, stage
from ..host.umi import process_umi
from ..io.fastq import (AsyncWriter, OutputWriter, ReadPack, format_selected,
                        prefetch_iter)
from ..ops.filters import FAILED_TYPES
from .se import (se_packed5_call, se_packed_call, se_pipeline,
                 se_pipeline_call)

# tag catalog for failed-stream suffixes: one buffer + per-code offsets
_TAG_BUF = b"".join(t.encode() for t in FAILED_TYPES)
_TAG_LEN = np.array([len(t) for t in FAILED_TYPES], np.int32)
_TAG_OFF = np.zeros(len(FAILED_TYPES), np.int64)
np.cumsum(_TAG_LEN[:-1], out=_TAG_OFF[1:])


def failed_tags(results: np.ndarray):
    """(buf, off, len) tag triple for format_selected from result codes."""
    return _TAG_BUF, _TAG_OFF[results], _TAG_LEN[results]


def encode_packs(it):
    """Generator stage run inside the prefetch thread: attach the packed
    transport encoding (ops/packed.py) to every ReadPack flowing through,
    when the link probe enables packing.  The encode pass is independent of
    the host prep (UMI rewrites names only; index filter reads names only),
    so doing it here overlaps it with the previous pack's fold.

    The resolved ``pack.enc`` is a mode tuple: ``("b5", packed, dict32)``
    when FQTOOL_TPU_PACKED5=1 and the pack's (base, qual) alphabet fits the
    5-bit dictionary transport (0.625x the bytes,
    ops/packed.py::encode5_host), else ``("b8", enc)``; None when the
    content is unencodable.  b5 is ON by default: the wire charges logical
    bytes (measured: a [B, 95] plane uploads in 0.67x the time of
    [B, 152]), and after the native single-pass encoder removed the
    host packing cost from the dispatch path (517 -> 13 ms per 64k
    chunk) an interleaved A/B measures b5 ahead on both SE (+16%) and
    PE (+9%) mean walls.  FQTOOL_TPU_PACKED5=0 disables."""
    from ..host.linkprobe import use_packed
    from ..io.fastq import ReadPack, shared_pool
    from ..ops.packed import encode5_host, encode_host

    b5_ok = os.environ.get("FQTOOL_TPU_PACKED5", "1") == "1"

    def enc_one(p):
        with stage("pack_encode"):
            enc = encode_host(p.seq, p.qual)
            if enc is None:
                return None
            if b5_ok:
                e5 = encode5_host(enc)
                if e5 is not None:
                    return ("b5",) + e5
            return ("b8", enc)

    it = iter(it)
    while True:
        # thread-side stage totals: tokenize = gunzip+parse+pack build,
        # pack_encode = packed-transport LUT pass (both overlap the main loop)
        with stage("tokenize"):
            item = next(it, None)
        if item is None:
            return
        if use_packed():
            packs = (item,) if isinstance(item, ReadPack) else item
            for p in packs:
                if isinstance(p, ReadPack):
                    # encode on the shared pool: overlaps the next pack's
                    # tokenize; the dispatcher resolves the future
                    p.enc = shared_pool().submit(enc_one, p)
        yield item


def resolve_enc(pack) -> None:
    """Materialize a pack's in-flight transport encoding (see encode_packs)."""
    if pack.enc is not None and hasattr(pack.enc, "result"):
        pack.enc = pack.enc.result()


def drain_pipelined(pending):
    """Iterate dispatched chunks ``(..., call)`` yielding ``(..., out)`` with
    chunk k+1's device->host blob fetch running in a background thread while
    the caller folds chunk k.  Exactly one transfer is in flight at any time
    (the axon attachment tolerates no concurrent transfers); the overlap is
    between the transfer and the host-side numpy fold, which touches no JAX
    state."""
    if len(pending) <= 1:
        for item in pending:
            yield item[:-1] + (item[-1].get(),)
        return
    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(max_workers=1)
    try:
        fut = ex.submit(pending[0][-1].get)
        for k, item in enumerate(pending):
            out = fut.result()
            if k + 1 < len(pending):
                fut = ex.submit(pending[k + 1][-1].get)
            yield item[:-1] + (out,)
    finally:
        # join the in-flight fetch even on error/abandonment: leaving it
        # running would put a transfer in flight concurrently with whatever
        # the caller's unwind path does next (the attachment tolerates only
        # one), and the non-daemon worker would block interpreter exit
        ex.shutdown(wait=True)


# Fixed device batch sizes: every kernel invocation uses one of these row
# counts (padded with masked rows) so the jit cache holds a handful of
# programs regardless of input size -- recompilation would dominate runtime,
# especially with a remote-compile TPU attachment.
SE_CHUNK = int(os.environ.get("FQTOOL_TPU_SE_CHUNK", "65536"))
_BUCKETS = (256, 2048, 8192, 16384, 32768)


def main_pack_reads(opt) -> int:
    """Main-pass pack framing for SE runs.

    Pack size only affects output content through split-file rotation
    boundaries, so when split is off the pack is sized as a multiple of the
    device chunk: every chunk runs full (no padded rows), and with
    FQTOOL_TPU_SE_PACK_CHUNKS>1 the device computes chunk k+1 while the host
    fetches/folds chunk k.  65536x2 measured best on the remote attachment
    (2.36s vs 3.89s for 131072x1 on 400k reads) -- two pipeline slots per
    pack amortize the per-fetch latency; on very high-latency links fewer,
    larger fetches may win (env-tunable).

    Shared with main.py's head-cache activation so the pre-pass reader and
    the main pass agree on framing (io/headcache.py).
    """
    pack_chunks = max(1, int(os.environ.get("FQTOOL_TPU_SE_PACK_CHUNKS", "2")))
    return (opt.buf_size.max_reads_in_pack if opt.split.enabled
            else SE_CHUNK * pack_chunks)


# Write unit: the fixed input-record quantum at which output streams are
# deflate-framed (every unit is an independent run of deflate blocks,
# io/fastq.py::OutputWriter.write).  Framing at a sub-pack quantum instead of
# the device pack makes the gz bytes identical between single-process runs
# and ANY multi-host world size, while letting pack ownership balance at
# ~1.6% instead of the 33% a 131072-read pack quantum gave at 13 packs over
# 4 ranks (the round-3 multi-host scaling tail).
WRITE_UNIT = int(os.environ.get("FQTOOL_TPU_WRITE_UNIT", "16384"))


def main_write_unit(opt) -> int:
    """Records per write unit for SE runs: WRITE_UNIT when the pack framing
    is unit-aligned, else the whole pack (single-process and multi-host
    compute this identically from opt, so their output framing agrees)."""
    pack_reads = main_pack_reads(opt)
    return WRITE_UNIT if pack_reads % WRITE_UNIT == 0 else pack_reads


def unit_bounds_for(count: int, unit: int) -> List[int]:
    """Row offsets [0, unit, 2*unit, ..., count] splitting a pack whose first
    row sits on a global unit boundary."""
    bounds = list(range(0, count, unit))
    bounds.append(count)
    return bounds


def chunk_rows(pack_total: int, cap: int) -> int:
    """Device batch size for a pack of ``pack_total`` rows.

    One size per pack: packs larger than every bucket use ``cap`` for every
    chunk (the padded tail reuses the same compiled program); small packs pick
    the smallest bucket that holds them whole.
    """
    for b in _BUCKETS:
        if pack_total <= b and b <= cap:
            return b
    return cap


def tail_rows(n: int, rows: int) -> int:
    """Program size for a chunk of ``n`` rows: the locked ``rows`` for full
    chunks, else the smallest bucket that holds the tail.

    Padded rows upload AND compute at full cost (call_blob zero-pads
    host-side), so a 6k-row tail in a 65536-row program wastes ~90% of that
    chunk's wire and chip time -- on the 4-proc CPU-mesh scaling bench the
    per-rank tail quantized device work to whole 65536-row programs (+-17%
    rank imbalance), and on the TPU e2e bench the stream tail re-ran a
    near-empty full-size program.  Cost: at most one extra cached compile
    per bucket size per config."""
    if n >= rows:
        return rows
    for b in _BUCKETS:
        if n <= b and b < rows:
            return b
    return rows


def _uniform_offset(start: np.ndarray) -> int:
    """The constant value of ``start`` when every row agrees (fixed-length
    UMIs), else -1 -- lets the pipeline use a static shift instead of a
    per-row gather (~100x cheaper on TPU)."""
    if len(start) == 0:
        return -1
    v = int(start[0])
    return v if bool((start == v).all()) else -1


def loginfo(msg: str) -> None:
    sys.stderr.write(time.strftime("[%H:%M:%S] ") + msg + "\n")


def maybe_enable_sharding(*blob_calls) -> None:
    """Data-parallel execution over all local devices: install a 1-D
    read-axis mesh on the pipeline calls when more than one device is
    available (disable with FQTOOL_TPU_SHARD=0).  Local devices only: in
    multi-host runs each host computes its own packs on its own chips and
    only statistics cross hosts (dist/multihost.py)."""
    if os.environ.get("FQTOOL_TPU_SHARD", "1") == "0":
        return
    devices = jax.local_devices()
    if len(devices) < 2:
        return
    from ..dist.sharding import make_mesh

    mesh = make_mesh(devices=devices)
    for call in blob_calls:
        call.set_mesh(mesh)
    loginfo(f"data-parallel over {len(devices)} devices")


def index_filter_matches(opt, pack, blacklist) -> np.ndarray:
    """Vectorized per-read blacklist match of firstIndex()
    (reference: src/filter.cpp:213-232)."""
    from ..host.names import (first_index_batch, index_match_batch,
                              name_matrix)

    nb, no, nl = pack.name_arrays()
    mat = name_matrix(nb, no, nl)
    s, t = first_index_batch(mat, nl)
    return index_match_batch(blacklist, mat, s, t, opt.index_filter.threshold)


def index_match(blacklist: List[str], target: bytes, threshold: int) -> bool:
    """Hamming-prefix match against a blacklist (reference: src/filter.cpp:191-211)."""
    t = target.decode("latin-1")
    tlen = len(t)
    for entry in blacklist:
        diff = 0
        for s in range(min(len(entry), tlen)):
            if entry[s] != t[s]:
                diff += 1
                if diff > threshold:
                    break
        if diff <= threshold:
            return True
    return False


def split_file_name(opt: Options, base: str, k: int) -> str:
    """Numbered split-file path ``<k+1 zero-padded>.<basename>``
    (reference: src/threadconfig.cpp:88-105)."""
    num = str(k + 1)
    if opt.split.digits > 0:
        num = num.zfill(opt.split.digits)
    d = os.path.dirname(base)
    return os.path.join(d, num + "." + os.path.basename(base)) if d \
        else num + "." + os.path.basename(base)


def replay_split_rotation(opt: Options, counts: List[tuple]):
    """Replay :class:`SplitWriter`'s rotation state machine over the global
    pack sequence without any output bytes.

    ``counts`` is the ordered per-pack ``(input_count, read_passed)`` list;
    returns ``(assign, nfiles)`` where ``assign[i]`` is the split-file
    number pack ``i``'s records land in and ``nfiles`` includes the empty
    files --split_file_number fills at close (threadconfig.cpp:107-137).
    Used by the multi-host merge: ranks report their owned packs' counts and
    rank 0 routes each pack's pre-deflated spans to the same numbered file
    the single-process run would have written."""
    assign = []
    working = 0
    cur = 0
    for count, read_passed in counts:
        assign.append(working)
        cur += read_passed if opt.split.by_file_lines else count
        if cur >= opt.split.size:
            if opt.split.by_file_lines or working + 1 < opt.split.number:
                working += 1
                cur = 0
    nfiles = working + 1
    if opt.split.by_file_number:
        nfiles = max(nfiles, opt.split.number)
    return assign, nfiles


class SplitWriter:
    """Split-output writer emulating ThreadConfig's rotation for a single
    worker (reference: src/threadconfig.cpp:88-137).  Matches the reference
    byte-for-byte when it runs with one worker thread."""

    def __init__(self, opt: Options, paired: bool):
        self.opt = opt
        self.paired = paired
        self.working_split = 0
        self.current_reads = 0
        self.stopped = False
        self.w1: Optional[OutputWriter] = None
        self.w2: Optional[OutputWriter] = None
        self._open()

    def _name(self, base: str) -> str:
        return split_file_name(self.opt, base, self.working_split)

    def _open(self) -> None:
        if not self.opt.out1:
            return
        if self.w1:
            self.w1.close()
        if self.w2:
            self.w2.close()
        self.w1 = OutputWriter(self._name(self.opt.out1), self.opt.compression)
        self.w2 = (OutputWriter(self._name(self.opt.out2), self.opt.compression)
                   if self.paired and self.opt.out2 else None)

    def write(self, data1: bytes, data2: bytes = b"") -> None:
        if self.stopped:
            return
        if self.w1:
            self.w1.write(data1)
        if self.w2:
            self.w2.write(data2)

    def mark_processed(self, n: int) -> None:
        """reference: src/threadconfig.cpp:107-127.

        Our runner is always a single deterministic worker, so `-w` is a
        performance hint only: split rotation always follows the reference's
        one-worker behavior (sequential file numbering; with -s, excess reads
        accumulate in the last file since number % 1 == 0 never stops the
        worker).
        """
        self.current_reads += n
        opt = self.opt
        if self.current_reads >= opt.split.size:
            if opt.split.by_file_lines or self.working_split + 1 < opt.split.number:
                self.working_split += 1
                self._open()
                self.current_reads = 0

    def close(self) -> None:
        # write empty files to honor --split_file_number
        # (threadconfig.cpp:131-137)
        if self.opt.split.by_file_number:
            while self.working_split + 1 < self.opt.split.number:
                self.working_split += 1
                self._open()
                self.current_reads = 0
        if self.w1:
            self.w1.close()
        if self.w2:
            self.w2.close()


class SingleEndRunner:
    def __init__(self, opt: Options):
        self.opt = opt
        self.params = opt.kernel_params(is_r2=False)
        self.pre_stats = self._make_stats()
        self.post_stats = self._make_stats()
        self.filter_result = FilterResultAccumulator(opt, paired=False)
        self.dup = (DuplicateTable(opt.duplicate.keylen, opt.duplicate.hist_size)
                    if opt.duplicate.enabled else None)
        self._pre_counter = 0
        self._post_counter = 0
        # multi-host: post-filter ORA sampling is deferred until the global
        # passing-prefix counts are known (host/ora_defer.py)
        self._ora_post_defer = None
        self._rows = 0  # device batch size, locked at the first pack
        # global stream index of the current pack's first record (multi-host
        # runs; None = single-host, dup table keeps its own local counter)
        self._record_base = None
        self.adapter_r1 = self._effective_adapter()

    def _make_stats(self) -> StatsAccumulator:
        opt = self.opt
        return StatsAccumulator(
            evaluated_seq_len=opt.est.seq_len1,
            kmer_len=opt.kmer.kmer_len if opt.kmer.enabled else 0,
            over_rep_sampling=opt.over_rep.sampling if opt.over_rep.enabled else 0,
            over_rep_seqs=opt.over_rep.over_rep_seq_count_r1,
        )

    def _effective_adapter(self) -> bytes:
        # SE trimming only uses an explicitly provided adapter
        # (seprocessor.cpp:321-323)
        if self.opt.adapter.enable_trimming and self.opt.adapter.adapter_seq_r1_provided:
            return self.opt.adapter.input_adapter_seq_r1.encode()
        return b""

    # ------------------------------------------------------------------
    def run(self) -> None:
        opt = self.opt
        from ..dist import multihost
        mh = multihost.active()
        if mh is not None:
            self._run_mh(mh)
            return
        maybe_enable_sharding(se_pipeline_call, se_packed_call,
                              se_packed5_call)
        split = SplitWriter(opt, paired=False) if opt.split.enabled else None
        out_writer = (AsyncWriter(opt.out1, opt.compression)
                      if opt.out1 and not opt.split.enabled else None)
        failed_writer = (AsyncWriter(opt.failed_out, opt.compression)
                         if opt.failed_out else None)

        pack_reads = main_pack_reads(opt)
        unit = main_write_unit(opt)
        total = 0

        def emit(pack):
            nonlocal total
            if split is not None:
                # split rotation consumes whole packs; its per-file framing
                # never has to match a multi-host merge (rejected there)
                outstr, failedstr, read_passed = self.complete_pack(pack)
                total += pack[0].count
                split.write(outstr)
                split.mark_processed(read_passed if opt.split.by_file_lines
                                     else pack[0].count)
                if failed_writer is not None:
                    failed_writer.write(failedstr)
                return
            bounds = unit_bounds_for(pack[0].count, unit)
            outstrs, failedstrs, _ = self.complete_pack(pack, bounds)
            total += pack[0].count
            if out_writer is not None:
                for s in outstrs:
                    out_writer.write(s)
            if failed_writer is not None:
                for s in failedstrs:
                    failed_writer.write(s)

        with device_profile():
            self._run_loop(opt, split, out_writer, failed_writer, emit, pack_reads)

        with stage("writer_close"):
            if split is not None:
                split.close()
            if out_writer is not None:
                out_writer.close()
            if failed_writer is not None:
                failed_writer.close()
        with stage("reports"):
            self.write_reports()

    def _run_mh(self, mh) -> None:
        """Multi-host run: process owned packs, write pack-indexed part
        files, reduce accumulators to rank 0, which merges the output streams
        and writes the reports (dist/multihost.py)."""
        from ..dist import multihost
        opt = self.opt
        if opt.split.enabled:
            self._run_mh_split(mh)
            return
        maybe_enable_sharding(se_pipeline_call, se_packed_call,
                              se_packed5_call)
        writers = {}
        if opt.out1:
            writers["out1"] = mh.part_writer(opt.out1, opt.compression)
        if opt.failed_out:
            writers["failed"] = mh.part_writer(opt.failed_out, opt.compression)
        pack_reads = main_pack_reads(opt)
        unit = main_write_unit(opt)
        batch_units = max(1, pack_reads // unit)
        if opt.over_rep.enabled:
            from ..host.ora_defer import DeferredOraSampler
            self._ora_post_defer = DeferredOraSampler(
                opt.over_rep.sampling, self.post_stats)
        for u_lo, pack in prefetch_iter(encode_packs(
                mh.iter_owned_se(opt.in1, unit, opt.phred64, batch_units))):
            # ORA pre-sampling strides over the GLOBAL stream order; units
            # are fixed-size so the base index is unit_idx * unit.  (Post
            # sampling stays per-host, the analog of the reference's
            # per-thread sampling under -w > 1.)
            self._pre_counter = u_lo * unit
            self._record_base = u_lo * unit
            bounds = unit_bounds_for(pack.count, unit)
            outstrs, failedstrs, _ = self.complete_pack(
                self.submit_pack(pack), bounds)
            for j, (s, f) in enumerate(zip(outstrs, failedstrs)):
                if "out1" in writers:
                    writers["out1"].write(u_lo + j, s)
                if "failed" in writers:
                    writers["failed"].write(u_lo + j, f)
        for w in writers.values():
            w.close()
        loginfo(f"SE processing finished (rank {mh.rank}/{mh.world})")
        from ..host import tracing
        tracing.mark("stream_done")
        if self._ora_post_defer is not None:
            from ..host.ora_defer import exchange_and_replay
            exchange_and_replay(mh, [self._ora_post_defer])
        payload = dict(
            pre=self.pre_stats, post=self.post_stats, fr=self.filter_result,
            dup=None if self.dup is None else self.dup.payload(),
            errs=multihost.drain_stream_errors(),
            idx={name: w.index for name, w in writers.items()})
        gathered = mh.gather(payload)
        tracing.mark("gather_done")
        if mh.rank == 0:
            multihost.surface_stream_errors(gathered)
            for pl in gathered[1:]:
                self.pre_stats.merge(pl["pre"])
                self.post_stats.merge(pl["post"])
                self.filter_result.merge(pl["fr"])
                if self.dup is not None and pl["dup"] is not None:
                    self.dup.merge_payload(pl["dup"])
            for name, w in writers.items():
                mh.merge_stream(w.final_path, opt.compression,
                                [pl["idx"].get(name, []) for pl in gathered])
            tracing.mark("merge_done")
            with stage("reports"):
                self.write_reports()
        mh.barrier()

    def _run_mh_split(self, mh) -> None:
        """Multi-host split (`-s`/`-S`) run.

        Ownership quantum = the split pack size (rotation happens between
        packs in the single-process path), each rank deflates its owned
        packs' output with the per-pack framing SplitWriter uses, and rank 0
        replays the rotation state machine over the gathered global
        ``(count, read_passed)`` sequence to route every pack's spans to the
        same numbered file -- bytes identical to the single-process run
        (reference rotation: src/threadconfig.cpp:88-137)."""
        from ..dist import multihost
        opt = self.opt
        maybe_enable_sharding(se_pipeline_call, se_packed_call,
                              se_packed5_call)
        pack_reads = main_pack_reads(opt)
        w_split = mh.part_writer(opt.out1, opt.compression) if opt.out1 else None
        w_failed = (mh.part_writer(opt.failed_out, opt.compression)
                    if opt.failed_out else None)
        if opt.over_rep.enabled:
            from ..host.ora_defer import DeferredOraSampler
            self._ora_post_defer = DeferredOraSampler(
                opt.over_rep.sampling, self.post_stats)
        rotation = {}
        for gidx, pack in prefetch_iter(encode_packs(
                mh.iter_owned_se(opt.in1, pack_reads, opt.phred64, 1))):
            self._pre_counter = gidx * pack_reads
            self._record_base = gidx * pack_reads
            outstr, failedstr, read_passed = self.complete_pack(
                self.submit_pack(pack))
            rotation[gidx] = (pack.count, read_passed)
            if w_split is not None:
                w_split.write(gidx, outstr)
            if w_failed is not None:
                w_failed.write(gidx, failedstr)
        for w in (w_split, w_failed):
            if w is not None:
                w.close()
        loginfo(f"SE split processing finished (rank {mh.rank}/{mh.world})")
        if self._ora_post_defer is not None:
            from ..host.ora_defer import exchange_and_replay
            exchange_and_replay(mh, [self._ora_post_defer])
        payload = dict(
            pre=self.pre_stats, post=self.post_stats, fr=self.filter_result,
            dup=None if self.dup is None else self.dup.payload(),
            rot=rotation,
            errs=multihost.drain_stream_errors(),
            idx={name: w.index for name, w in
                 (("out1", w_split), ("failed", w_failed)) if w is not None})
        gathered = mh.gather(payload)
        if mh.rank == 0:
            multihost.surface_stream_errors(gathered)
            for pl in gathered[1:]:
                self.pre_stats.merge(pl["pre"])
                self.post_stats.merge(pl["post"])
                self.filter_result.merge(pl["fr"])
                if self.dup is not None and pl["dup"] is not None:
                    self.dup.merge_payload(pl["dup"])
            rot: dict = {}
            for pl in gathered:
                rot.update(pl["rot"])
            counts = [rot[i] for i in sorted(rot)]
            assign, nfiles = replay_split_rotation(opt, counts)
            if w_split is not None:
                mh.merge_split_stream(
                    opt.out1, opt.compression,
                    [pl["idx"].get("out1", []) for pl in gathered],
                    assign, nfiles,
                    lambda k: split_file_name(opt, opt.out1, k))
            if w_failed is not None:
                mh.merge_stream(
                    opt.failed_out, opt.compression,
                    [pl["idx"].get("failed", []) for pl in gathered])
            with stage("reports"):
                self.write_reports()
        mh.barrier()

    def _run_loop(self, opt, split, out_writer, failed_writer, emit, pack_reads):
        # Cross-pack device overlap (submit pack k+1 before folding pack k)
        # is opt-in: the remote axon attachment intermittently deadlocks
        # device_get when a second batch of programs is enqueued from the
        # host.  Intra-pack chunk dispatch is still asynchronous either way.
        overlap = os.environ.get("FQTOOL_TPU_PACK_OVERLAP", "0") == "1"
        in_flight = None
        from ..io.headcache import iter_packs_cached
        it = prefetch_iter(encode_packs(
            iter_packs_cached(opt.in1, pack_reads, opt.phred64)))
        while True:
            with stage("input_wait"):
                pack = next(it, None)
            if pack is None:
                break
            if not overlap:
                emit(self.submit_pack(pack))
                continue
            submitted = self.submit_pack(pack)
            if in_flight is not None:
                emit(in_flight)
            in_flight = submitted
        if in_flight is not None:
            emit(in_flight)
        loginfo("SE processing finished")

    # ------------------------------------------------------------------
    def submit_pack(self, pack: ReadPack):
        """Host prep (index filter, UMI) + async dispatch of all device
        chunks; returns a handle for :meth:`complete_pack`."""
        opt = self.opt
        B = pack.count
        resolve_enc(pack)
        keep = np.ones(B, bool)
        if opt.index_filter.enabled:
            keep = ~index_filter_matches(opt, pack, opt.index_filter.blacklist1)
        start0, _ = process_umi(opt, pack)

        with stage("dispatch"):
            return self._dispatch(pack, start0, keep)

    def _dispatch(self, pack, start0, keep):
        opt = self.opt
        B = pack.count
        # lock the batch size at the first pack so a smaller tail pack never
        # compiles a second program mid-run
        if not self._rows:
            self._rows = chunk_rows(B, SE_CHUNK)
        rows = self._rows
        pending = []
        lo = 0
        while lo < B:
            hi = min(lo + rows, B)
            n = hi - lo
            r = tail_rows(n, rows)
            # call_blob pads rows and picks the transport (blob.py)
            rest = (pack.lens[lo:hi], start0[lo:hi], keep[lo:hi],
                    np.ones(n, bool))
            kw = dict(p=self.params,
                      adapter_r1=self.adapter_r1,
                      use_start0=bool(opt.umi.enabled),
                      with_kmer=bool(opt.kmer.enabled),
                      start0_static=_uniform_offset(start0[lo:hi])
                      if opt.umi.enabled else -1)
            # packed transport: the encoding is attached to the pack by
            # encode_packs in the prefetch thread (link-probe gated); None
            # when packing is off or the content is unencodable
            enc = pack.enc
            if enc is not None and enc[0] == "b5":
                pending.append((n, se_packed5_call.call_blob(
                    (enc[1][lo:hi],) + rest, r, aux=(enc[2],),
                    enc_width=pack.seq.shape[1], **kw)))
            elif enc is not None:
                pending.append((n, se_packed_call.call_blob(
                    (enc[1][lo:hi],) + rest, r, **kw)))
            else:
                pending.append((n, se_pipeline_call.call_blob(
                    (pack.seq[lo:hi], pack.qual[lo:hi]) + rest, r, **kw)))
            lo = hi
        return pack, start0, keep, pending

    def _drain_chunks(self, pending) -> dict:
        """Collect dispatched chunk outputs; fold stats/dup, concatenate the
        per-read arrays."""
        merged: dict = {}
        base = self._record_base
        drain = drain_pipelined(pending)
        while True:
            with stage("device_wait"):
                item = next(drain, None)
            if item is None:
                break
            n, out = item
            self.pre_stats.add_batch(out.pop("pre"))
            self.post_stats.add_batch(out.pop("post"))
            if "pre_kmer" in out:
                self.pre_stats.add_kmer(out.pop("pre_kmer"))
            if "post_kmer" in out:
                self.post_stats.add_kmer(out.pop("post_kmer"))
            if self.dup is not None:
                d = out.pop("dup")
                valid = np.asarray(d.valid).copy()
                valid[n:] = False
                self.dup.add_batch(
                    np.asarray(d.key), np.asarray(d.kmer_hi),
                    np.asarray(d.kmer_lo), np.asarray(d.gc), valid,
                    key_hi=None if d.key_hi is None else np.asarray(d.key_hi),
                    base=base)
            if base is not None:
                base += n
            for k, v in out.items():
                merged.setdefault(k, []).append(np.asarray(v)[:n])
        return {k: (np.concatenate(v) if len(v) > 1 else v[0])
                for k, v in merged.items()}

    def process_pack(self, pack: ReadPack):
        """Synchronous submit + complete (used by tests and simple callers)."""
        return self.complete_pack(self.submit_pack(pack))

    def complete_pack(self, submitted, unit_bounds: Optional[List[int]] = None):
        """Drain a submitted pack and build its output strings.

        ``unit_bounds=None``: outstr/failedstr are single byte strings (the
        whole pack).  With bounds (row offsets, see :func:`unit_bounds_for`)
        they are per-write-unit LISTS -- each unit's bytes are written as an
        independent deflate framing so single-process and multi-host output
        bytes agree (see WRITE_UNIT)."""
        pack, start0, keep, pending = submitted
        opt = self.opt
        B = pack.count
        out = self._drain_chunks(pending)

        result = np.asarray(out["result"])
        passed = np.asarray(out["passed"])
        front = np.asarray(out["front"])
        rlen = np.asarray(out["rlen"])
        dropped = np.asarray(out["dropped"])

        # filter-fate counters: index-filtered reads never count
        # (seprocessor.cpp:304-307)
        self.filter_result.add_filter_results(result[keep], n_each=1)

        # polyG / polyX trim events ------------------------------------
        if "polyg_trimmed" in out:
            m = np.asarray(out["polyg_trimmed"]) & keep
            self.filter_result.add_polyx_trimmed(
                np.full(B, 3), np.asarray(out["polyg_trim_len"]), m)
        if "polyx_trimmed" in out:
            m = np.asarray(out["polyx_trimmed"]) & keep
            self.filter_result.add_polyx_trimmed(
                np.asarray(out["polyx_base"]), np.asarray(out["polyx_trim_len"]), m)

        # adapter trim events (bulk np.unique counting, host/accounting.py)
        if "adapter_found" in out:
            from ..host.accounting import span_counts, suffix_counts
            found = np.asarray(out["adapter_found"]) & keep
            pos = np.asarray(out["adapter_pos"]).astype(np.int64)
            before = np.asarray(out["len_after_polyg"]).astype(np.int64)
            idx = np.flatnonzero(found)
            p = pos[idx]
            neg, posi = idx[p < 0], idx[p >= 0]
            counts = suffix_counts(self.adapter_r1, -pos[neg])
            counts += span_counts(pack.seq, posi, front[posi] + pos[posi],
                                  before[posi] - pos[posi])
            self.filter_result.add_adapter_trimmed_bulk(counts, is_r2=False)

        # ORA sampling: every sampling-th read in stream order
        # (stats.cpp:246-248); only the selected rows touch Python
        if opt.over_rep.enabled:
            sampling = opt.over_rep.sampling
            for i in range(-self._pre_counter % sampling, B, sampling):
                self.pre_stats.add_over_rep_read(
                    pack.seq[i, : pack.lens[i]].tobytes())
            self._pre_counter += B

        # output strings ------------------------------------------------
        select_pass = passed & keep
        read_passed = int(select_pass.sum())

        def per_unit(select, *fmt_args, **fmt_kw):
            if unit_bounds is None:
                return format_selected(pack, select, *fmt_args, **fmt_kw)
            units = []
            for lo, hi in zip(unit_bounds, unit_bounds[1:]):
                m = np.zeros_like(select)
                m[lo:hi] = select[lo:hi]
                units.append(format_selected(pack, m, *fmt_args, **fmt_kw))
            return units

        outstr = per_unit(select_pass, front, rlen)

        if opt.over_rep.enabled:
            sampling = opt.over_rep.sampling
            passing = np.flatnonzero(select_pass)
            if self._ora_post_defer is not None:
                # multi-host: the global passing prefix is unknown until end
                # of stream -- spool the passing sequences and replay later
                # (host/ora_defer.py)
                from ..host.ora_defer import ragged_gather
                self._ora_post_defer.add_interval(
                    self._record_base,
                    ragged_gather(pack.seq, passing, front[passing],
                                  rlen[passing]),
                    rlen[passing])
            else:
                for k in range(-self._post_counter % sampling,
                               len(passing), sampling):
                    i = passing[k]
                    s, n = int(front[i]), int(rlen[i])
                    self.post_stats.add_over_rep_read(
                        pack.seq[i, s : s + n].tobytes())
                self._post_counter += len(passing)

        failedstr = b"" if unit_bounds is None else \
            [b""] * (len(unit_bounds) - 1)
        if opt.failed_out:
            # the reference trims reads IN PLACE (trimAndCut returns the same
            # object, filter.cpp:186-188), so the failed stream carries the
            # fully trimmed read -- except for dropped reads (trimAndCut
            # returned NULL before mutating), which stay at their post-UMI
            # original content (seprocessor.cpp:346-348)
            select_fail = keep & ~passed
            f_start = np.where(dropped, start0, front).astype(np.int32)
            f_len = np.where(dropped, np.asarray(pack.lens) - start0,
                             rlen).astype(np.int32)
            failedstr = per_unit(select_fail, f_start, f_len,
                                 tags=failed_tags(result))
        return outstr, failedstr, read_passed

    # ------------------------------------------------------------------
    def write_reports(self) -> None:
        opt = self.opt
        dup_hist = dup_gc = None
        dup_rate = 0.0
        if self.dup is not None:
            dup_hist, dup_gc, dup_rate = self.dup.stat_all()
        report = report_json.build_report(
            opt, self.filter_result, self.pre_stats, self.post_stats,
            dup_hist=dup_hist, dup_mean_gc=dup_gc, dup_rate=dup_rate)
        report_json.write_report(opt.json_file, report)
        from ..host import report_html
        report_html.write_report(opt, self.filter_result, self.pre_stats,
                                 self.post_stats, None, None,
                                 dup_hist, dup_gc, dup_rate, None, 0)
