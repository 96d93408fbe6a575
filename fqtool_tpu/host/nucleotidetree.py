"""Nucleotide trie for adapter-sequence extension.

Port of ``NucleotideTree`` (reference: src/nucleotidetree.cpp): an 8-ary trie
keyed by ``base & 0x07`` whose dominant path (>= 95% of >= 50 counts per
level) extends a detected adapter seed.
"""

from __future__ import annotations

from typing import Dict, Tuple

RATIO_THRESHOLD = 0.95  # nucleotidetree.cpp:59
NUM_THRESHOLD = 50      # nucleotidetree.cpp:60


class _Node:
    __slots__ = ("count", "base", "children")

    def __init__(self, base: str = "N"):
        self.count = 0
        self.base = base
        self.children: Dict[int, _Node] = {}


class NucleotideTree:
    def __init__(self):
        self.root = _Node()

    def add_seq(self, seq: str) -> None:
        """reference: src/nucleotidetree.cpp:41-55 -- stops at the first N."""
        cur = self.root
        for ch in seq:
            if ch == "N":
                break
            b = ord(ch) & 0x07
            nxt = cur.children.get(b)
            if nxt is None:
                nxt = _Node(ch)
                cur.children[b] = nxt
            nxt.count += 1
            cur = nxt

    def get_dominant_path(self) -> Tuple[str, bool]:
        """Returns (path, reached_leaf); reached_leaf is False when a level
        with enough coverage has no dominant child
        (reference: src/nucleotidetree.cpp:57-90)."""
        out = []
        reached_leaf = True
        cur = self.root
        while True:
            total = sum(c.count for c in cur.children.values())
            if total < NUM_THRESHOLD:
                break
            dominant = None
            # iterate in child-index order (0..7) like the reference array scan
            for b in sorted(cur.children):
                child = cur.children[b]
                if child.count / total >= RATIO_THRESHOLD:
                    dominant = child
                    break
            if dominant is None:
                reached_leaf = False
                break
            out.append(dominant.base)
            cur = dominant
        return "".join(out), reached_leaf
