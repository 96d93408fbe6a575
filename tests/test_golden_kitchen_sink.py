"""Kitchen-sink golden tests: every major feature enabled at once, stressing
the op-order interactions of the reference pipeline
(reference: src/seprocessor.cpp:290-353, src/peprocessor.cpp:261-508)."""

from __future__ import annotations

from .oracle import TESTDATA
from .test_golden_random import check

R1 = TESTDATA / "r1.fq.gz"
R2 = TESTDATA / "r2.fq.gz"


def test_se_everything(oracle, tmp_path):
    """SE: UMI + fixed trims + all three quality cuts' precedence (front +
    right; tail suppressed by right per filter.cpp:155) + polyG + polyX +
    adapter + length/complexity/quality filters + dup + kmer + failed out."""
    check(oracle, tmp_path,
          ["-i", str(R1), "-o", "out.fq.gz", "--failed_out", "failed.fq.gz",
           "-u", "--umi_location", "3", "--umi_length", "6",
           "-f", "2", "-t", "1", "-b", "140",
           "--enable_cut_front", "--cut_front_mean_qual", "22",
           "--enable_cut_right", "--cut_right_window", "6",
           "-g", "-x",
           "-a", "--adapter_of_read1", "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA",
           "-q", "-Q", "18", "-N", "7",
           "-l", "--min_length", "20", "--max_length", "200",
           "-y", "-Y", "0.2",
           "-d", "--dup_ana_key_len", "13",
           "--kmer", "--kmer_length", "5"],
          ["out.fq.gz", "failed.fq.gz"])


def test_pe_everything_merge(oracle, tmp_path):
    """PE: UMI(per-index) + trims + cuts + polyG(arg-swap quirk) + detection
    + overlap adapter trim + correction + polyX + merge with unpaired routing
    + dup + kmer + failed out."""
    check(oracle, tmp_path,
          ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "--failed_out", "failed.fq.gz",
           "-m", "--merge_output", "merged.fq.gz",
           "-u", "--umi_location", "5",
           "-f", "1", "-F", "2", "-t", "1", "-T", "1",
           "--enable_cut_front",
           "-g", "-x",
           "-a", "--detect_pe_adapter",
           "-c", "--min_overlap_len", "25",
           "-q", "-Q", "20",
           "-l", "--min_length", "25",
           "-d", "--kmer", "--kmer_length", "6"],
          ["o1.fq.gz", "o2.fq.gz", "merged.fq.gz", "failed.fq.gz"])


def test_pe_everything_unpaired(oracle, tmp_path):
    """PE without merge: unpaired1/unpaired2 routing under heavy trimming +
    index filter + ORA + correction + explicit adapters."""
    idx = tmp_path / "blacklist.txt"
    idx.write_text("TGGTAGCT\n")
    check(oracle, tmp_path,
          ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
           "--unpaired_read1", "up1.fq.gz", "--unpaired_read2", "up2.fq.gz",
           "--failed_out", "failed.fq.gz",
           "--enable_index_filter", "--index1_file", str(idx),
           "--max_diff_for_match", "1",
           "--ora", "--ora_sample", "5",
           "-a", "--adapter_of_read1", "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA",
           "--adapter_of_read2", "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT",
           "-c", "-q", "-Q", "28", "-e", "25",
           "-x", "--base_to_trim", "ATCG"],
          ["o1.fq.gz", "o2.fq.gz", "up1.fq.gz", "up2.fq.gz", "failed.fq.gz"])
