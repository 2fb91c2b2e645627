"""FASTA/FASTQ reading with transparent gzip/bzip2 decompression.

Parity target: KSeqWrapper (lib/mmseqs/src/commons/KSeqWrapper.{h,cpp}),
i.e. kseq semantics: header = name + optional comment, sequence bytes
concatenated across wrapped lines, whitespace inside sequence lines is
dropped.
"""
import bz2
import gzip
import io
from dataclasses import dataclass
from typing import Iterator

import numpy as np


@dataclass
class FastaEntry:
    name: str        # first whitespace-delimited token of the header
    comment: str     # remainder of the header line ('' if none)
    seq: np.ndarray  # uint8 ASCII

    @property
    def header(self) -> str:
        return f"{self.name} {self.comment}" if self.comment else self.name


def _open_maybe_compressed(path: str):
    with open(path, "rb") as probe:
        magic = probe.read(3)
    if magic[:2] == b"\x1f\x8b":
        return gzip.open(path, "rb")
    if magic[:3] == b"BZh":
        return bz2.open(path, "rb")
    return open(path, "rb")


def iter_fasta(path: str) -> Iterator[FastaEntry]:
    """Iterate entries of a (possibly compressed) FASTA or FASTQ file."""
    with _open_maybe_compressed(path) as fh:
        yield from iter_fasta_handle(fh)


def iter_fasta_handle(fh) -> Iterator[FastaEntry]:
    data = fh.read()
    if isinstance(data, str):
        data = data.encode("ascii")
    if not data:
        return
    if data.lstrip()[:1] == b"@":
        yield from _iter_fastq(data)
        return
    pos = data.find(b">")
    if pos < 0:
        return
    blocks = data[pos + 1:].split(b"\n>")
    for block in blocks:
        nl = block.find(b"\n")
        if nl < 0:
            header, body = block, b""
        else:
            header, body = block[:nl], block[nl + 1:]
        header = header.rstrip(b"\r").decode("ascii", "replace")
        name, _, comment = header.partition(" ")
        if "\t" in name:
            name, _, rest = header.partition("\t")
            comment = rest
        seq = body.translate(None, delete=b" \t\r\n")
        yield FastaEntry(name, comment.strip(), np.frombuffer(seq, dtype=np.uint8).copy())


def _iter_fastq(data: bytes) -> Iterator[FastaEntry]:
    lines = data.split(b"\n")
    i = 0
    while i + 1 < len(lines):
        if not lines[i].startswith(b"@"):
            i += 1
            continue
        header = lines[i][1:].rstrip(b"\r").decode("ascii", "replace")
        seq = lines[i + 1].strip()
        name, _, comment = header.partition(" ")
        yield FastaEntry(name, comment.strip(), np.frombuffer(seq, dtype=np.uint8).copy())
        i += 4


# (prefix, length, verticalBarPos) — exact table from Util::getFastaHeaderPosition
# (lib/mmseqs/src/commons/Util.cpp:189-204).
_HEADER_DBS = (
    ("uc", 2, 0), ("cl|", 3, 1), ("sp|", 3, 1), ("tr|", 3, 1), ("gb|", 3, 1),
    ("ref|", 4, 1), ("pdb|", 4, 1), ("bbs|", 4, 1), ("lcl|", 4, 1),
    ("pir||", 5, 1), ("prf||", 5, 1), ("gnl|", 4, 2), ("pat|", 4, 2),
    ("gi|", 3, 3),
)


def parse_fasta_header_accession(header: str) -> str:
    """Extract the accession exactly like Util::parseFastaHeader
    (lib/mmseqs/src/commons/Util.cpp:173-256), including its quirks
    (e.g. any id starting with 'uc' is treated as a Uniclust id).
    """
    # first non-whitespace word (skipNoneWhitespace stops at ' ' or '\t'...)
    end = 0
    while end < len(header) and header[end] not in " \t\n\0":
        end += 1
    word = header[:end]
    if not word:
        return ""
    offset = 10 if word.startswith("consensus_") else 0
    for prefix, plen, vbar in _HEADER_DBS:
        if word.startswith(prefix, offset):
            start = offset + plen
            if vbar > 1:
                for _ in range(vbar - 1):
                    nxt = word.find("|", start)
                    if nxt < 0:
                        return ""
                    start = nxt + 1
            for sep in ("|", None):
                if sep is None:
                    e = _find_first_of(word, " \n", start)
                else:
                    e = word.find(sep, start)
                if e >= 0:
                    return word[start:e]
            return word[start:]
    e = _find_first_of(word, " \n", offset)
    if e >= 0:
        return word[offset:e]
    return word[offset:]


def _find_first_of(s: str, chars: str, start: int) -> int:
    for i in range(start, len(s)):
        if s[i] in chars:
            return i
    return -1
