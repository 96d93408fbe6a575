"""Throughput benchmark: the five driver configs from BASELINE.md.

Measures end-to-end CLI throughput (gzip in -> device pipeline -> gzip out ->
reports) on replicated copies of the reference testdata, steady-state (a
small warm-up run absorbs JIT compilation; the reference binary has no
comparable startup cost, and steady-state is the honest comparison for a
streaming tool).  Prints ONE JSON line: the headline SE metric in the
driver's schema plus a ``configs`` map with every config's reads/s and
``stages`` with the per-stage wall-time split from host/tracing.py.

Baselines: the reference binary measured in this container (BASELINE.md;
1 vCPU, best of 3).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("FQTOOL_TPU_TRACE", "1")

TESTDATA = "/root/reference/testdata"

# (name, baseline reads/s from BASELINE.md, reps, paired, n_records, argv)
CONFIGS = [
    ("se_qualtrim", 16_700, 5, False, 400_000,
     ["-q", "-f", "3", "-t", "2"]),
    ("se_polygx", None, 4, False, 400_000,
     ["-g", "-x"]),
    ("se_adapter", 21_000, 4, False, 400_000,
     ["-a", "--adapter_of_read1", "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"]),
    ("pe_merge_corr", 20_600, 4, True, 100_000,
     ["-m", "--merge_output", "merged.fq.gz", "-c"]),
    ("pe_full", 10_000, 4, True, 100_000,
     ["-q", "--kmer", "--kmer_length", "6", "-d", "-a", "--detect_pe_adapter"]),
]


def replicate(src: str, dst: str, n: int) -> None:
    data = open(src, "rb").read()
    with open(dst, "wb") as out:
        for _ in range(n):
            out.write(data)  # concatenated gzip members form one valid stream


def main() -> None:
    workdir = tempfile.mkdtemp(prefix="fqtool_bench_")
    # inputs: 400k SE reads, 100k PE pairs, 100k polyG reads
    replicate(f"{TESTDATA}/r1.fq.gz", f"{workdir}/se.fq.gz", 32)
    replicate(f"{TESTDATA}/r1.fq.gz", f"{workdir}/pe1.fq.gz", 8)
    replicate(f"{TESTDATA}/r2.fq.gz", f"{workdir}/pe2.fq.gz", 8)
    replicate(f"{TESTDATA}/polygr1.fq", f"{workdir}/polyg.fq", 400_000)

    from fqtool_tpu.host import tracing
    from fqtool_tpu.main import main as fq_main

    results = {}
    stages = {}
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        for name, baseline, reps, paired, n_records, argv in CONFIGS:
            if paired:
                small = ["-i", f"{TESTDATA}/r1.fq.gz", "-I", f"{TESTDATA}/r2.fq.gz",
                         "-o", "w1.fq.gz", "-O", "w2.fq.gz"]
                big = ["-i", "pe1.fq.gz", "-I", "pe2.fq.gz",
                       "-o", "o1.fq.gz", "-O", "o2.fq.gz"]
            elif name == "se_polygx":
                small = ["-i", f"{TESTDATA}/polygr1.fq", "-o", "w.fq.gz"]
                big = ["-i", "polyg.fq", "-o", "o.fq.gz"]
            else:
                small = ["-i", f"{TESTDATA}/r1.fq.gz", "-o", "w.fq.gz"]
                big = ["-i", "se.fq.gz", "-o", "o.fq.gz"]
            argv_w = [(a.replace("merged", "wmerged") if "merged" in a else a)
                      for a in argv]
            fq_main(small + argv_w)  # warm-up: compile cache
            best = float("inf")
            for _ in range(reps):
                snap = dict(tracing._totals)
                t0 = time.perf_counter()
                fq_main(big + argv)
                dt = time.perf_counter() - t0
                if dt < best:
                    best = dt
                    stages[name] = {
                        k: round(tracing._totals[k] - snap.get(k, 0.0), 3)
                        for k in tracing._totals}
            reads = n_records * (2 if paired else 1)
            results[name] = {
                "reads_per_sec": round(reads / best, 1),
                "wall_s": round(best, 3),
            }
            if baseline:
                results[name]["vs_baseline"] = round(reads / best / baseline, 3)
    finally:
        os.chdir(cwd)
        shutil.rmtree(workdir, ignore_errors=True)

    head = results["se_qualtrim"]
    print(json.dumps({
        "metric": "se_reads_per_sec",
        "value": head["reads_per_sec"],
        "unit": "reads/s",
        "vs_baseline": head["vs_baseline"],
        "configs": results,
        "stages": stages,
    }))


if __name__ == "__main__":
    sys.exit(main())
