"""Report-content tests: HTML structure and JSON layout details."""

from __future__ import annotations

import json
from pathlib import Path

from .oracle import TESTDATA
from .test_golden_se import run_ours

R1 = TESTDATA / "r1.fq.gz"
R2 = TESTDATA / "r2.fq.gz"


def test_html_report_sections_se(oracle, tmp_path):
    ours = tmp_path / "ours"
    run_ours(["-i", str(R1), "-o", "out.fq.gz", "-q", "-g", "-x", "-d",
              "--kmer", "--kmer_length", "4", "--ora"], ours)
    html = (ours / "report.html").read_text()
    ref = oracle.run(["-i", str(R1), "-o", "out.fq.gz", "-q", "-g", "-x", "-d",
                      "--kmer", "--kmer_length", "4", "--ora", "-w", "1"],
                     tmp_path / "oracle")
    ref_html = (tmp_path / "oracle" / "report.html").read_text()

    # every functional section of the reference report must be present
    for marker in ("showOrHide", "plotly-latest.min.js", "Before filtering",
                   "After filtering", "Filtering Results", "PolyX Trimming",
                   "Duplication", "plot_duplication", "KMER counting",
                   "overrepresented sequences", "Software Environment",
                   "quality", "base contents"):
        assert marker in html, f"missing section marker: {marker}"
        assert marker in ref_html, f"oracle missing {marker}?"


def test_html_report_sections_pe(oracle, tmp_path):
    ours = tmp_path / "ours"
    run_ours(["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
              "-q", "-a", "--detect_pe_adapter"], ours)
    html = (ours / "report.html").read_text()
    for marker in ("Insert Size Peak", "Detected Read1 Adapter",
                   "Detected Read2 Adapter", "Adapter or bad ligation of read1",
                   "Adapter or bad ligation of read2", "read2: quality"):
        assert marker in html, f"missing section marker: {marker}"


def test_json_key_order_and_indent(tmp_path):
    """Serialization layout matches nlohmann dump(4): sorted keys, 4-space
    indent."""
    run_ours(["-i", str(R1), "-o", "out.fq.gz", "-q"], tmp_path)
    text = (tmp_path / "report.json").read_text()
    assert text.startswith("{\n    \"")
    parsed = json.loads(text)
    keys = list(parsed.keys())
    assert keys == sorted(keys)
