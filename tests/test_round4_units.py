"""Round-4 unit tests: split-rotation replay and tail-chunk buckets.

These pin the pure-host logic the multi-host split merge and the device
dispatch rely on (pipeline/runner.py); the end-to-end behavior is covered
by tests/test_multihost.py::test_multihost_split_* and the goldens.
"""

from __future__ import annotations

import pytest

from fqtool_tpu.config.options import Options
from fqtool_tpu.pipeline.runner import (_BUCKETS, SE_CHUNK,
                                        replay_split_rotation,
                                        split_file_name, tail_rows)


def _opt(by_lines=False, by_number=False, size=10, number=3, digits=4):
    opt = Options()
    opt.split.by_file_lines = by_lines
    opt.split.by_file_number = by_number
    opt.split.size = size
    opt.split.number = number
    opt.split.digits = digits
    opt.split.enabled = by_lines or by_number
    return opt


class _Split:
    """Reference model: SplitWriter.mark_processed's exact state machine
    (reference: src/threadconfig.cpp:107-127) without any I/O."""

    def __init__(self, opt):
        self.opt = opt
        self.working = 0
        self.cur = 0

    def mark(self, n):
        self.cur += n
        o = self.opt
        if self.cur >= o.split.size:
            if o.split.by_file_lines or self.working + 1 < o.split.number:
                self.working += 1
                self.cur = 0


@pytest.mark.parametrize("by_lines", [False, True])
def test_replay_matches_state_machine(by_lines):
    """replay_split_rotation must assign every pack the file the live
    SplitWriter would have been writing to when the pack arrived."""
    opt = _opt(by_lines=by_lines, by_number=not by_lines, size=7, number=4)
    # (input_count, read_passed) per pack; passed < count exercises the
    # by-lines counter
    counts = [(5, 3), (5, 5), (5, 2), (5, 4), (5, 5), (5, 1), (3, 3)]
    assign, nfiles = replay_split_rotation(opt, counts)
    m = _Split(opt)
    expect = []
    for count, passed in counts:
        expect.append(m.working)
        m.mark(passed if by_lines else count)
    assert assign == expect
    if by_lines:
        assert nfiles == m.working + 1
    else:
        # --split_file_number fills empty trailing files up to the quota
        assert nfiles == max(m.working + 1, opt.split.number)


def test_replay_by_number_caps_rotation():
    """-s never rotates past number-1: excess packs accumulate in the last
    file (number % 1 == 0 semantics of the single-worker reference run)."""
    opt = _opt(by_number=True, size=2, number=3)
    counts = [(2, 2)] * 10
    assign, nfiles = replay_split_rotation(opt, counts)
    assert assign == [0, 1] + [2] * 8
    assert nfiles == 3


def test_replay_by_number_fill():
    """Fewer packs than the quota: nfiles still honors --split_file_number
    (trailing files are created empty, threadconfig.cpp:131-137)."""
    opt = _opt(by_number=True, size=100, number=5)
    assign, nfiles = replay_split_rotation(opt, [(10, 10)])
    assert assign == [0]
    assert nfiles == 5


def test_replay_empty_stream():
    opt = _opt(by_lines=True, size=4, number=1)
    assert replay_split_rotation(opt, []) == ([], 1)
    opt = _opt(by_number=True, size=4, number=4)
    assert replay_split_rotation(opt, []) == ([], 4)


def test_split_file_name_digits():
    opt = _opt(digits=4)
    assert split_file_name(opt, "out.fq.gz", 0) == "0001.out.fq.gz"
    assert split_file_name(opt, "d/out.fq", 11) == "d/0012.out.fq"
    opt = _opt(digits=0)
    assert split_file_name(opt, "out.fq", 9) == "10.out.fq"


def test_tail_rows():
    """Full chunks keep the locked program size; tails pick the smallest
    bucket that holds them (padded rows upload AND compute)."""
    rows = SE_CHUNK
    assert tail_rows(rows, rows) == rows
    assert tail_rows(rows + 1, rows) == rows  # defensive: never shrinks full
    assert tail_rows(1, rows) == _BUCKETS[0]
    for b in _BUCKETS:
        if b < rows:
            assert tail_rows(b, rows) == b
            assert tail_rows(b + 1, rows) != b or b == _BUCKETS[-1]
    # between the largest bucket and rows: fall back to the full program
    if _BUCKETS[-1] < rows:
        assert tail_rows(_BUCKETS[-1] + 1, rows) == rows
    # a locked size smaller than every bucket never picks a LARGER program
    assert tail_rows(100, 256) == 256
    assert tail_rows(100, 128) == 128
