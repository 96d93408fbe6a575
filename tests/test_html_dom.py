"""HTML report DOM-equality golden tests.

Compares the full content of our HTML report against the oracle's: every
table cell (label and value) in document order, and every numeric literal in
every <script> block (Plotly curve data, duplication/insert-size plots, ORA
canvas distributions).  This is the strong form of report verification the
marker tests in test_reports.py cannot give -- a wrong percentage in any
summary row or curve array fails here.

Exclusions:
  * the ``command`` cell (argv differs by construction);
  * for SE configs, the duplication plot script: the reference half-clears
    its histogram buffer (memset with sizeof(int), seprocessor.cpp:245), so
    the oracle's plot is normalized against heap garbage (same UB the JSON
    comparison skips).  The PE path has no such bug and IS compared.
"""

from __future__ import annotations

import re
from pathlib import Path

from .oracle import TESTDATA
from .test_golden_se import run_ours

R1 = TESTDATA / "r1.fq.gz"
R2 = TESTDATA / "r2.fq.gz"

_NUM = re.compile(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?")


def _cells(path: Path):
    html = path.read_text()
    body = re.sub(r"<script.*?</script>", "", html, flags=re.S)
    return re.findall(r"<td[^>]*>(.*?)</td>", body, flags=re.S)


def _scripts(path: Path):
    return re.findall(r"<script[^>]*>(.*?)</script>", path.read_text(), flags=re.S)


def _assert_dom_equal(ours: Path, ref: Path, skip_dup_script: bool):
    a, b = _cells(ours), _cells(ref)
    assert len(a) == len(b), f"cell count {len(a)} vs {len(b)}"
    diffs = []
    for i, (x, y) in enumerate(zip(a, b)):
        # the value cells after these labels differ by construction
        if i > 0 and b[i - 1].strip() in ("Command", "CWD"):
            continue
        if x != y:
            diffs.append(f"cell {i}: {x[:80]!r} vs {y[:80]!r}")
    assert not diffs, "\n".join(diffs[:20])

    sa, sb = _scripts(ours), _scripts(ref)
    assert len(sa) == len(sb), f"script count {len(sa)} vs {len(sb)}"
    for i, (x, y) in enumerate(zip(sa, sb)):
        if skip_dup_script and "plot_duplication" in x:
            continue
        nx, ny = _NUM.findall(x), _NUM.findall(y)
        bad = [(j, p, q) for j, (p, q) in enumerate(zip(nx, ny)) if p != q]
        assert len(nx) == len(ny) and not bad, \
            f"script {i}: {len(nx)} vs {len(ny)} numbers, first diffs {bad[:5]}"


def _check(oracle, tmp_path, args, skip_dup_script):
    ours = tmp_path / "ours"
    run_ours(args, ours)
    res = oracle.run(args + ["-w", "1", "-J", "report.json", "-H", "report.html"],
                     tmp_path / "oracle")
    assert res.returncode == 0, res.stderr
    _assert_dom_equal(ours / "report.html", tmp_path / "oracle" / "report.html",
                      skip_dup_script)


def test_html_dom_se(oracle, tmp_path):
    """SE with quality filter, polyG/X, duplication, kmer and ORA tables."""
    _check(oracle, tmp_path,
           ["-i", str(R1), "-o", "out.fq.gz", "-q", "-g", "-x", "-d",
            "--kmer", "--kmer_length", "4", "--ora"],
           skip_dup_script=True)


def test_html_dom_se_filters(oracle, tmp_path):
    """SE with length/complexity filters and explicit adapter (exercises the
    swapped-denominator quirk rows and the adapter details table)."""
    _check(oracle, tmp_path,
           ["-i", str(R1), "-o", "out.fq.gz", "-q", "-l", "-y",
            "--min_length", "100", "--max_length", "149", "-a",
            "--adapter_of_read1", "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"],
           skip_dup_script=True)


def test_html_dom_pe(oracle, tmp_path):
    """PE with detection, correction and duplication: insert-size plot,
    per-side curve sections, adapter tables, and the dup plot compared in
    full (no UB on the PE path)."""
    _check(oracle, tmp_path,
           ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
            "-q", "-d", "-c", "-a", "--detect_pe_adapter"],
           skip_dup_script=False)


def test_html_dom_pe_merge(oracle, tmp_path):
    """PE merge mode: the MergedAndFiltered section naming, merged-read
    curves, insert-size plot, and correction counters in the filtering
    table."""
    _check(oracle, tmp_path,
           ["-i", str(R1), "-I", str(R2), "-o", "o1.fq.gz", "-O", "o2.fq.gz",
            "-m", "--merge_output", "merged.fq.gz", "-c", "-q"],
           skip_dup_script=False)


def test_html_dom_long_reads(oracle, tmp_path):
    """SE long reads (>300 cycles): the log-scale downsampled curve x-axes
    (stats.cpp:642-669) compared numerically against the oracle."""
    import random
    rng = random.Random(5)
    fq = tmp_path / "long.fq"
    with open(fq, "wb") as f:
        for i in range(400):
            n = rng.choice([310, 384, 441, 500])
            seq = "".join(rng.choices("ACGTN", weights=[24, 24, 24, 24, 2], k=n))
            qual = "".join(chr(rng.randint(33, 73)) for _ in range(n))
            f.write(f"@L{i}:1:2 1:N:0:AC\n{seq}\n+\n{qual}\n".encode())
    _check(oracle, tmp_path,
           ["-i", str(fq), "-o", "out.fq.gz", "-q", "--kmer",
            "--kmer_length", "4"],
           skip_dup_script=True)
