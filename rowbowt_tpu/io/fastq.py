"""FASTA/FASTQ streaming reader (kseq equivalent, include/kseq.h).

Handles plain or gzip files, FASTA ('>') and FASTQ ('@') records, multi-line
sequences, and yields (name, seq, qual) like kseq: name is the first
whitespace-delimited token, qual is b"" for FASTA.
"""

from __future__ import annotations

import gzip
from typing import Iterator


def _open(path: str):
    f = open(path, "rb")
    if f.read(2) == b"\x1f\x8b":
        f.seek(0)
        return gzip.open(f, "rb")
    f.seek(0)
    return f


def read_seqs(path: str) -> Iterator[tuple[str, bytes, bytes]]:
    with _open(path) as f:
        name = None
        seq_parts: list[bytes] = []
        line = f.readline()
        while line:
            line = line.rstrip(b"\r\n")
            if not line:
                line = f.readline()
                continue
            if line[:1] == b">":
                if name is not None:
                    yield name, b"".join(seq_parts), b""
                name = line[1:].split()[0].decode() if len(line) > 1 else ""
                seq_parts = []
                line = f.readline()
            elif line[:1] == b"@":
                if name is not None:  # pending FASTA record
                    yield name, b"".join(seq_parts), b""
                    name, seq_parts = None, []
                rname = line[1:].split()[0].decode() if len(line) > 1 else ""
                seq = f.readline().rstrip(b"\r\n")
                plus = f.readline()
                if not plus.startswith(b"+"):
                    raise ValueError(f"malformed FASTQ near {rname!r}")
                qual = f.readline().rstrip(b"\r\n")
                if len(qual) != len(seq):
                    raise ValueError("truncated quality string")  # kseq err -2
                yield rname, seq, qual
                line = f.readline()
            else:
                if name is None:
                    raise ValueError(f"unexpected line: {line[:40]!r}")
                seq_parts.append(line)
                line = f.readline()
        if name is not None:
            yield name, b"".join(seq_parts), b""


def batched(it, size: int):
    """Group an iterator into lists of at most `size`."""
    buf = []
    for x in it:
        buf.append(x)
        if len(buf) == size:
            yield buf
            buf = []
    if buf:
        yield buf
