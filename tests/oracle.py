"""Golden-test oracle: the reference binary compiled out-of-tree.

The reference has no tests of its own (SURVEY.md section 4); the practical
correctness oracle is the compiled reference run on the same inputs with one
worker thread (deterministic output order and thread-0-sampled statistics).
"""

from __future__ import annotations

import gzip
import json
import os
import subprocess
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

REPO = Path(__file__).resolve().parent.parent
REFERENCE_SRC = Path("/root/reference/src")
TESTDATA = Path("/root/reference/testdata")
ORACLE_BIN = REPO / "build" / "fqtool_oracle"


@dataclass
class OracleResult:
    workdir: Path
    returncode: int
    stdout: str
    stderr: str

    def fastq(self, name: str) -> List[Tuple[bytes, bytes, bytes, bytes]]:
        return read_fastq(self.workdir / name)

    def json_report(self, name: str = "report.json") -> dict:
        with open(self.workdir / name) as f:
            return json.load(f)


class Oracle:
    def __init__(self, binary: Path):
        self.binary = binary

    @classmethod
    def build(cls) -> "Oracle":
        if not ORACLE_BIN.exists():
            ORACLE_BIN.parent.mkdir(parents=True, exist_ok=True)
            srcs = sorted(str(p) for p in REFERENCE_SRC.glob("*.cpp"))
            cmd = ["g++", "-std=c++11", "-O2", "-w", "-I", str(REFERENCE_SRC),
                   *srcs, "-o", str(ORACLE_BIN), "-lz", "-pthread"]
            subprocess.run(cmd, check=True)
        return cls(ORACLE_BIN)

    def run(self, args: List[str], workdir: Path) -> OracleResult:
        workdir.mkdir(parents=True, exist_ok=True)
        proc = subprocess.run(
            [str(self.binary), *args], cwd=workdir, capture_output=True,
            text=True, timeout=600)
        return OracleResult(workdir, proc.returncode, proc.stdout, proc.stderr)


def read_fastq(path) -> List[Tuple[bytes, bytes, bytes, bytes]]:
    path = Path(path)
    if not path.exists():
        return []
    opener = gzip.open if path.suffix == ".gz" else open
    out = []
    with opener(path, "rb") as f:
        lines = f.read().split(b"\n")
    i = 0
    while i + 3 < len(lines) or (i + 3 == len(lines) and lines[i]):
        rec = lines[i : i + 4]
        if len(rec) < 4:
            break
        out.append(tuple(rec))
        i += 4
    return out


def compare_json(a: dict, b: dict, path: str = "", rel_tol: float = 1e-9) -> List[str]:
    """Recursively compare reports; returns a list of difference descriptions.

    Skipped paths:
      * the Software section (cwd/command/version differ by construction);
      * Duplication.Histogram bins >= 16: the reference SE path half-clears
        the histogram buffer (memset with sizeof(int) instead of
        sizeof(size_t), seprocessor.cpp:245), so the upper bins contain heap
        garbage in the oracle output.  We do not reproduce undefined behavior.
      * Duplication.MeanGC/Histogram last bin (31): keys whose count equals
        histSize are written OUT OF BOUNDS by the reference
        (``hist[count]``/``meanGC[count]`` with count == histSize,
        duplicate.cpp:140-151) and so silently vanish from its report's
        last bin; we clamp them into bin 31 honestly (verified by exact
        simulation: the oracle's MeanGC[31] equals the drop-model value).
    """
    diffs: List[str] = []
    if path == "/Software" or path.startswith("/Software/"):
        return diffs
    if path.startswith("/Duplication/Histogram["):
        idx = int(path.split("[")[1].rstrip("]"))
        if idx >= 16:
            return diffs
    if path.startswith("/Duplication/MeanGC["):
        idx = int(path.split("[")[1].rstrip("]"))
        if idx >= 31:
            return diffs
    if isinstance(a, dict) and isinstance(b, dict):
        for k in sorted(set(a) | set(b)):
            if k not in a:
                diffs.append(f"{path}/{k}: missing in ours")
            elif k not in b:
                diffs.append(f"{path}/{k}: missing in oracle")
            else:
                diffs.extend(compare_json(a[k], b[k], f"{path}/{k}", rel_tol))
    elif isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            diffs.append(f"{path}: length {len(a)} vs {len(b)}")
        else:
            for i, (x, y) in enumerate(zip(a, b)):
                diffs.extend(compare_json(x, y, f"{path}[{i}]", rel_tol))
    elif isinstance(a, bool) or isinstance(b, bool):
        if a != b:
            diffs.append(f"{path}: {a} vs {b}")
    elif isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if isinstance(a, int) and isinstance(b, int):
            if a != b:
                diffs.append(f"{path}: {a} vs {b}")
        else:
            if abs(a - b) > rel_tol * max(1.0, abs(a), abs(b)):
                diffs.append(f"{path}: {a} vs {b}")
    else:
        if a != b:
            diffs.append(f"{path}: {a!r} vs {b!r}")
    return diffs


def diff_fastq(ours, theirs, limit: int = 5) -> List[str]:
    diffs = []
    if len(ours) != len(theirs):
        diffs.append(f"record count: {len(ours)} vs {len(theirs)}")
    for i, (a, b) in enumerate(zip(ours, theirs)):
        if a != b:
            diffs.append(f"record {i}: {a} vs {b}")
            if len(diffs) >= limit:
                break
    return diffs
