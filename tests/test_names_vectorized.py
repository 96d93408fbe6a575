"""Equivalence of the vectorized name ops (first_index, index blacklist
match, UMI tagging) with the direct scalar ports of the reference."""

import numpy as np
import pytest

from fqtool_tpu.config.options import Options
from fqtool_tpu.host.names import (first_index_batch, index_match_batch,
                                   name_matrix)
from fqtool_tpu.host.umi import first_index, process_umi, process_umi_scalar
from fqtool_tpu.io.fastq import make_pack


def _random_names(rng, n):
    names = []
    for i in range(n):
        kind = rng.integers(0, 6)
        if kind == 0:  # realistic Illumina with dual index
            names.append(b"@A00403:136:HFMYWDSXX:2:1101:%d:1000 1:N:0:GAGAGGCA+GAGAGGC"
                         % rng.integers(1000, 99999))
        elif kind == 1:  # single index
            names.append(b"@SIM:%d 2:N:0:ACGTACGT" % rng.integers(0, 9999))
        elif kind == 2:  # no colon at all
            names.append(b"@read_%d" % i)
        elif kind == 3:  # short name
            names.append(b"@r%d" % (i % 10))
        elif kind == 4:  # '+' but no space
            names.append(b"@x:%d+AA" % rng.integers(0, 99))
        else:  # colon near the end
            names.append(b"@y%d:" % rng.integers(0, 99))
    return names


def _random_records(rng, n, maxlen=30):
    names = _random_names(rng, n)
    recs = []
    for nm in names:
        ln = int(rng.integers(0, maxlen))
        seq = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), ln))
        qual = bytes(rng.integers(33, 74, ln, dtype=np.uint8))
        recs.append((nm, seq, b"+", qual))
    return recs


def test_first_index_batch_matches_scalar():
    rng = np.random.default_rng(11)
    names = _random_names(rng, 300)
    nlen = np.fromiter((len(n) for n in names), count=len(names), dtype=np.int32)
    off = np.zeros(len(names), np.int64)
    np.cumsum(nlen[:-1], out=off[1:])
    mat = name_matrix(b"".join(names), off, nlen)
    s, t = first_index_batch(mat, nlen)
    for i, nm in enumerate(names):
        want = first_index(nm)
        got = nm[s[i] : s[i] + t[i]] if t[i] else b""
        assert got == want, (nm, got, want)


def test_index_match_batch_matches_scalar():
    from fqtool_tpu.pipeline.runner import index_match

    rng = np.random.default_rng(13)
    names = _random_names(rng, 300)
    blacklist = ["GAGAGGCA", "ACGTACGT", "TTTT", ""][:3]
    nlen = np.fromiter((len(n) for n in names), count=len(names), dtype=np.int32)
    off = np.zeros(len(names), np.int64)
    np.cumsum(nlen[:-1], out=off[1:])
    mat = name_matrix(b"".join(names), off, nlen)
    s, t = first_index_batch(mat, nlen)
    for thr in (0, 1, 3):
        got = index_match_batch(blacklist, mat, s, t, thr)
        for i, nm in enumerate(names):
            assert got[i] == index_match(blacklist, first_index(nm), thr), \
                (nm, thr)


@pytest.mark.parametrize("loc", [1, 2, 3, 4, 5, 6])  # UMI_LOC_* constants
@pytest.mark.parametrize("paired", [False, True])
@pytest.mark.parametrize("extra", [{}, {"not_trim_read": True},
                                   {"drop_other_comment": True},
                                   {"length": 0}, {"skip": 4}])
def test_umi_vectorized_matches_scalar(loc, paired, extra):
    rng = np.random.default_rng(hash((loc, paired, str(extra))) % (1 << 32))
    recs1 = _random_records(rng, 200)
    recs2 = _random_records(rng, 200) if paired else None

    opt = Options()
    opt.umi.enabled = True
    opt.umi.location = loc
    opt.umi.length = extra.get("length", 8)
    opt.umi.skip = extra.get("skip", 0)
    opt.umi.not_trim_read = extra.get("not_trim_read", False)
    opt.umi.drop_other_comment = extra.get("drop_other_comment", False)

    pv1, pv2 = make_pack(recs1), (make_pack(recs2) if paired else None)
    ps1, ps2 = make_pack(recs1), (make_pack(recs2) if paired else None)

    sv1, sv2 = process_umi(opt, pv1, pv2)
    ss1, ss2 = process_umi_scalar(opt, ps1, ps2)

    np.testing.assert_array_equal(sv1, ss1)
    if paired:
        np.testing.assert_array_equal(sv2, ss2)
    assert pv1.names == ps1.names
    if paired:
        assert pv2.names == ps2.names


def test_ors_filter_matches_bruteforce():
    """Hashed containment filter == reference's quadratic live-map scan."""
    from fqtool_tpu.host.evaluator import _filter_substrings

    def brute(hot):
        items = sorted(hot.items())
        removed = set()
        for s, count in items:
            for s2, count2 in items:
                if s != s2 and s2 not in removed and s in s2 \
                        and count // count2 < 10:
                    removed.add(s)
                    break
        return {s: c for s, c in hot.items() if s not in removed}

    rng = np.random.default_rng(3)
    for trial in range(20):
        hot = {}
        base = ["".join(rng.choice(list("ACGT"), 40)) for _ in range(30)]
        for b in base:
            hot[b] = int(rng.integers(3, 400))
            for _ in range(3):
                i = rng.integers(0, 31)
                j = rng.integers(0, 21)
                hot[b[i : i + 10]] = int(rng.integers(3, 400))
                hot[b[j : j + 20]] = int(rng.integers(3, 400))
        assert _filter_substrings(dict(hot)) == brute(dict(hot)), trial


def test_dominant_path_matches_trie():
    """The vectorized dominant_path must agree with the executable-spec trie
    (reference: src/nucleotidetree.cpp:41-90) on random sequence sets."""
    import random

    from fqtool_tpu.host.nucleotidetree import NucleotideTree, dominant_path

    rng = random.Random(7)
    for case in range(60):
        n = rng.choice([0, 1, 30, 49, 50, 51, 200, 800])
        base = "".join(rng.choice("ACGT") for _ in range(rng.randint(5, 40)))
        seqs = []
        for _ in range(n):
            s = list(base)
            # random mutations, truncations and N injections so levels
            # hover around the 95%/50 thresholds; include IUPAC and
            # lowercase bytes, which the trie buckets by base & 0x07
            # ('W' merges with 'G', 'a' with 'A' or 'I'...)
            for _ in range(rng.randint(0, 3)):
                i = rng.randrange(len(s))
                s[i] = rng.choice("ACGTNWacgtRYK")
            s = "".join(s[: rng.randint(0, len(s))])
            seqs.append(s)
        tree = NucleotideTree()
        for s in seqs:
            tree.add_seq(s)
        assert dominant_path(seqs) == tree.get_dominant_path(), \
            f"case {case} diverged"


def test_native_top_keys_matches_python_loop():
    """fq_top_keys must replicate the reference's quirky insertion loop
    (evaluator.cpp:287-337) exactly -- verified against the Python spec."""
    import numpy as np

    from fqtool_tpu.io import native

    if native.get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    for _ in range(10):
        size = 1 << 16
        counts = np.zeros(size, np.int64)
        nz = rng.choice(np.arange(1, size), 2000, replace=False)
        counts[nz] = rng.integers(1, 30, 2000)
        cand = np.nonzero(counts > 0)[0].astype(np.int64)
        nat = native.top_keys(counts, cand, 10).tolist()
        topkeys = [0] * 10
        for k in cand.tolist():
            val = counts[k]
            for t in range(9, -1, -1):
                if val < counts[topkeys[t]]:
                    if t < 9:
                        for m in range(9, t + 1, -1):
                            topkeys[m] = topkeys[m - 1]
                        topkeys[t + 1] = k
                    break
                elif t == 0:
                    for m in range(9, 0, -1):
                        topkeys[m] = topkeys[m - 1]
                    topkeys[t] = k
        assert nat == topkeys
