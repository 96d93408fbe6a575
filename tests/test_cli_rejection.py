"""CLI constraint rejection parity: every needs/excludes edge of the
reference's CLI11 graph (reference: src/main.cpp:18-120) must be rejected by
BOTH the oracle binary and our parser when violated."""

from __future__ import annotations

import pytest

from fqtool_tpu.config.cli import _EXCLUDES, _NEEDS, parse_args
from fqtool_tpu.config.options import OptionError
from .oracle import TESTDATA

R1 = str(TESTDATA / "r1.fq.gz")
R2 = str(TESTDATA / "r2.fq.gz")

# a valid operand for every value-taking dependent flag
_VALUES = {
    "-I": R2,
    "-O": "o2.fq.gz",
    "--merge_output": "m.fq.gz",
    "--adapter_of_read1": "ACGTACGT",
    "--adapter_of_read2": "ACGTACGT",
    "--index1_file": R1,   # any existing file
    "--index2_file": R1,
    "--umi_location": "3",
    "--umi_length": "4",
    "--umi_skip_length": "1",
    "--split_file_number": "3",
    "--splie_file_line": "1000",
    "--dup_ana_key_len": "12",
    "--dup_ana_hist_size": "16",
    "--min_len_detect_polyG": "8",
    "--max_mismatches_polyG": "2",
    "--one_mismatch_each_polyG": "6",
    "--base_to_trim": "G",
    "--min_len_detect_polyX": "8",
    "--max_mismatches_polyX": "2",
    "--one_mismatch_each_polyX": "6",
    "--cut_front_window": "4",
    "--cut_tail_window": "4",
    "--cut_right_window": "4",
    "--cut_front_mean_qual": "20",
    "--cut_tail_mean_qual": "20",
    "--cut_right_mean_qual": "20",
    "-Q": "20",
    "-U": "0",
    "-N": "3",
    "-e": "20",
    "--min_length": "10",
    "--max_length": "100",
    "-Y": "0",
    "--max_diff_for_match": "1",
    "--ora_sample": "10",
    "--kmer_length": "6",
}

# prerequisites a flag itself needs so ONLY the edge under test is violated
_SELF_NEEDS = {
    "-m": ["-I", R2],
    "-s": [],
    "-S": [],
    "--in_fq_interleaved": [],
}


def _flag_argv(flag: str):
    return [flag, _VALUES[flag]] if flag in _VALUES else [flag]


def _ours_rejects(argv) -> bool:
    try:
        parse_args(argv)
    except (SystemExit, OptionError):
        return True
    return False


@pytest.mark.parametrize("dep_flag,pre_flag",
                         [(f, p) for _, f, _, p in _NEEDS],
                         ids=[f"{f}-needs-{p}" for _, f, _, p in _NEEDS])
def test_needs_rejected(oracle, tmp_path, dep_flag, pre_flag):
    argv = ["-i", R1, "-o", "out.fq.gz"] + _flag_argv(dep_flag)
    res = oracle.run(argv, tmp_path / "oracle")
    assert res.returncode != 0, f"oracle accepted {dep_flag} without {pre_flag}"
    assert _ours_rejects(argv), f"we accepted {dep_flag} without {pre_flag}"


@pytest.mark.parametrize("flag,other",
                         [(f, o) for _, f, _, o in _EXCLUDES],
                         ids=[f"{f}-excludes-{o}" for _, f, _, o in _EXCLUDES])
def test_excludes_rejected(oracle, tmp_path, flag, other):
    argv = ["-i", R1, "-o", "out.fq.gz"]
    argv += _SELF_NEEDS.get(flag, []) + _flag_argv(flag)
    argv += _SELF_NEEDS.get(other, []) + _flag_argv(other)
    res = oracle.run(argv, tmp_path / "oracle")
    assert res.returncode != 0, f"oracle accepted {flag} with {other}"
    assert _ours_rejects(argv), f"we accepted {flag} with {other}"


def test_valid_baseline_accepted(oracle, tmp_path):
    """Sanity: the harness args themselves are accepted by both sides."""
    argv = ["-i", R1, "-o", "out.fq.gz"]
    res = oracle.run(argv + ["-w", "1"], tmp_path / "oracle")
    assert res.returncode == 0, res.stderr
    assert not _ours_rejects(argv)
