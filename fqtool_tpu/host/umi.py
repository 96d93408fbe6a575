"""UMI extraction and read-name tagging.

Host-side port of ``UmiProcessor`` (reference: src/umiprocessor.cpp): extracts
the UMI from index fields or read prefixes, appends ``OX:Z:``/``BZ:Z:`` tags at
the first space of the name, and reports per-read front-trim lengths for the
device pipeline (trimFront clamps to len-1, read.h:192-197).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..config.options import (Options, UMI_LOC_INDEX1, UMI_LOC_INDEX2,
                              UMI_LOC_PER_INDEX, UMI_LOC_PER_READ,
                              UMI_LOC_READ1, UMI_LOC_READ2)


def first_index(name: bytes) -> bytes:
    """reference: src/read.h:106-123"""
    n = len(name)
    end = n
    if n < 5:
        return b""
    for i in range(n - 3, -1, -1):
        c = name[i : i + 1]
        if c == b"+":
            end = i - 1
        if c == b":":
            return name[i + 1 : i + 1 + (end - i)]
    return b""


def _add_tag(name: bytes, tag: bytes, drop_other_comment: bool) -> bytes:
    """reference: src/umiprocessor.cpp:78-89"""
    pos = name.find(b" ")
    if pos < 0:
        return name + tag
    if drop_other_comment:
        return name[:pos] + tag
    return name[:pos] + tag + name[pos:]


def process_umi(opt: Options, pack1, pack2=None) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Apply UMI processing to one (pair of) pack(s) in place.

    Mutates ``pack.names`` and returns per-read front-trim offsets (start0)
    for read1 and read2 (None when unpaired).
    """
    B = pack1.count
    start1 = np.zeros(B, np.int32)
    start2 = np.zeros(B, np.int32) if pack2 is not None else None
    if not opt.umi.enabled:
        return start1, start2

    loc = opt.umi.location
    length = opt.umi.length
    skip = opt.umi.skip
    trim = not opt.umi.not_trim_read

    for i in range(B):
        umi = b" OX:Z:"
        qua = b" BZ:Z:"
        l1 = int(pack1.lens[i])
        l2 = int(pack2.lens[i]) if pack2 is not None else 0
        if loc == UMI_LOC_INDEX1:
            umi += first_index(pack1.names[i])
        elif loc == UMI_LOC_INDEX2:
            if pack2 is not None:
                umi += first_index(pack2.names[i])
        elif loc == UMI_LOC_READ1:
            n = min(l1, length)
            umi += pack1.read_seq(i, 0, n)
            qua += pack1.read_qual(i, 0, n)
            if trim:
                start1[i] = max(0, min(length + skip, l1 - 1))
        elif loc == UMI_LOC_READ2:
            if pack2 is not None:
                n = min(l2, length)
                umi += pack2.read_seq(i, 0, n)
                # note the reference uses read1's length in the min here
                # (umiprocessor.cpp:37) -- quirk preserved
                qua += pack2.read_qual(i, 0, min(l1, length))
                if trim:
                    start2[i] = max(0, min(length + skip, l2 - 1))
        elif loc == UMI_LOC_PER_INDEX:
            umi += first_index(pack1.names[i])
            if pack2 is not None:
                umi += b"-" + first_index(pack2.names[i])
        elif loc == UMI_LOC_PER_READ:
            n1 = min(l1, length)
            umi += pack1.read_seq(i, 0, n1)
            qua += pack1.read_qual(i, 0, n1)
            if trim:
                start1[i] = max(0, min(length + skip, l1 - 1))
            if pack2 is not None:
                n2 = min(l2, length)
                umi += b"-" + pack2.read_seq(i, 0, n2)
                if trim:
                    start2[i] = max(0, min(length + skip, l2 - 1))
                # read2's quality is extracted AFTER both trimFront calls and
                # bounded by the TRIMMED read1 length (umiprocessor.cpp:55-60)
                l1_trimmed = l1 - int(start1[i])
                qua += b"-" + pack2.read_qual(i, int(start2[i]),
                                              min(l1_trimmed, length))

        tag = umi
        if len(tag) > 6 and len(qua) > 6:
            tag = tag + qua
        if len(tag) > 6:
            pack1.names[i] = _add_tag(pack1.names[i], tag, opt.umi.drop_other_comment)
            if pack2 is not None:
                pack2.names[i] = _add_tag(pack2.names[i], tag, opt.umi.drop_other_comment)
    return start1, start2
