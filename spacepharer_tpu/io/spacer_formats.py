"""Parsers for CRISPR-array tool outputs and spacer FASTA files.

Parity target: parsespacer (src/util/ParseSpacer.cpp:15-417). Format is
sniffed from the first five bytes of the file
(ParseSpacer.cpp:28-44): 'piler'->PILER-CR, 'ORGAN'->CRT,
'Array'->CRISPRDetect, 'Seque'->MinCED, '#####'->CRISPRFinder
(unsupported), anything else -> FASTA.

Tool formats are position-stateful line machines; coordinates follow the
reference exactly, including the CRISPRDetect reverse-array convention
(start = pos - repeat_len, end = start - spacer_len;
ParseSpacer.cpp:322-327). Spacers shorter than 20 nt or containing
non-ACGT characters are dropped for tool formats (ParseSpacer.cpp:55-62,
161); FASTA input is taken verbatim with no filtering.
"""
import os
import re
from dataclasses import dataclass
from typing import Iterable

import numpy as np

from .fasta import iter_fasta, parse_fasta_header_accession

MIN_SPACER_LEN = 20

_FORMATS = {
    b"piler": "PILERCR",
    b"ORGAN": "CRT",
    b"#####": "CRISPRFINDER",
    b"Array": "CRISPRDETECT",
    b"Seque": "MINCED",
}


@dataclass
class SpacerRecord:
    header: str   # "acc_Array_i_spacer_j_start_end_len" or FASTA header
    accession: str  # lookup accession (same as header for tool formats)
    seq: bytes
    file_idx: int


def detect_format(data: bytes) -> str:
    return _FORMATS.get(data[:5], "FASTA")


def _is_nucl(seq: str) -> bool:
    return bool(seq) and not re.search(r"[^ATCG]", seq)


def _split_ws(line: str):
    return line.split()


def _split_tok(line: str, sep: str):
    """strtok-style split: any char of sep delimits, empties collapsed."""
    return [t for t in re.split("[" + re.escape(sep) + "]", line) if t]


def parse_spacer_file(path: str, file_idx: int) -> tuple[list[SpacerRecord], str]:
    """Parse one input file. Returns (records, detected_format)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if not data:
        return [], "EMPTY"
    fmt = detect_format(data)
    if fmt == "CRISPRFINDER":
        raise ValueError("CRISPRfinder format is not supported")
    if fmt == "FASTA":
        out = []
        for e in iter_fasta(path):
            if not e.name:
                raise ValueError(f"invalid FASTA entry in {path}")
            acc = parse_fasta_header_accession(e.header)
            out.append(SpacerRecord(e.header, acc, e.seq.tobytes(), file_idx))
        return out, fmt

    lines = data.decode("ascii", "replace").split("\n")
    out: list[SpacerRecord] = []
    array_num = 0
    spacer_num = 0
    accession = ""
    # 0-inits mirror ParseSpacer.cpp:166-167 — with a missing '>' header
    # line the reference still fires its entry-offset conditions (and
    # emits spacers with an empty accession); keep that behavior
    array_entry = 0
    header_entry = 0
    is_reverse = False

    def emit(seq: str, start: int, end: int):
        hdr = (f"{accession}_Array_{array_num}_spacer_{spacer_num}"
               f"_{start}_{end}_{len(seq)}")
        out.append(SpacerRecord(hdr, hdr, seq.encode("ascii"), file_idx))

    if fmt == "CRT":
        accession = parse_fasta_header_accession(lines[0][11:])
    elif fmt == "MINCED":
        accession = parse_fasta_header_accession(lines[0].split("'")[1])

    entry = 0
    i = 0
    while i < len(lines):
        line = lines[i]
        if fmt in ("CRT", "MINCED"):
            if line.startswith("C"):
                array_entry = entry
                array_num += 1
            if entry > 3 and entry == array_entry + 3:
                while i < len(lines) and not lines[i].startswith("-"):
                    vals = _split_tok(lines[i], "\t")
                    if len(vals) == 4:
                        seq = "".join(vals[2].split())
                        if len(seq) >= MIN_SPACER_LEN and _is_nucl(seq):
                            spacer_num += 1
                            start = _atoi(vals[0]) + len(vals[1])
                            emit(seq, start, start + len(seq))
                    i += 1
                    entry += 1
        elif fmt == "PILERCR":
            if line.startswith("A"):
                array_entry = entry
                array_num += 1
            if line.startswith(">") and entry == array_entry + 1:
                accession = parse_fasta_header_accession(line[1:])
                header_entry = entry
            if line.startswith(" ") and entry == header_entry + 4:
                while i < len(lines) and not lines[i].startswith("="):
                    vals = _split_ws(lines[i])
                    if vals:
                        seq = vals[-1]
                        if len(seq) >= MIN_SPACER_LEN and _is_nucl(seq):
                            spacer_num += 1
                            start = _atoi(vals[0]) + _atoi(vals[1])
                            emit(seq, start, start + len(seq))
                    i += 1
                    entry += 1
        elif fmt == "CRISPRDETECT":
            if line.startswith("A"):
                array_entry = entry
                array_num += 1
            if line.startswith(">") and entry == array_entry + 1:
                hdr_vals = _split_tok(line[1:], "\t")
                is_reverse = len(hdr_vals) > 1 and "Reverse" in hdr_vals[1]
                accession = parse_fasta_header_accession(line[1:])
                header_entry = entry
            if line.startswith(" ") and entry == header_entry + 4:
                while i < len(lines) and not lines[i].startswith("="):
                    vals = _split_tok(lines[i], "\t")
                    if len(vals) > 5:
                        seq = "".join(vals[5].split())
                        if len(seq) >= MIN_SPACER_LEN and _is_nucl(seq):
                            spacer_num += 1
                            if is_reverse:
                                start = _atoi(vals[0]) - _atoi(vals[1])
                                emit(seq, start, start - len(seq))
                            else:
                                start = _atoi(vals[0]) + _atoi(vals[1])
                                emit(seq, start, start + len(seq))
                    i += 1
                    entry += 1
        i += 1
        entry += 1
    return out, fmt


def _atoi(s: str) -> int:
    """strtoul semantics: leading whitespace skipped, parse digits."""
    m = re.match(r"\s*(\d+)", s)
    return int(m.group(1)) if m else 0


def collect_input_files(filenames: list[str], file_include: str = ".*",
                        file_exclude: str = "^$") -> list[str]:
    """Expand a directory / .tsv list / explicit file list into file paths.

    Mirrors parsespacer's input handling (ParseSpacer.cpp:74-132):
    a single directory is walked recursively (include/exclude regex on
    base names), a single .tsv lists one path per line, otherwise the
    arguments are the files themselves.
    """
    if len(filenames) == 1 and os.path.isdir(filenames[0]):
        inc = re.compile(file_include)
        exc = re.compile(file_exclude)
        found = []
        stack = [filenames[0]]
        while stack:
            d = stack.pop()
            try:
                entries = sorted(os.listdir(d))
            except OSError:
                continue
            for name in entries:
                full = os.path.join(d, name)
                if os.path.isdir(full):
                    stack.append(full)
                elif inc.search(name) and not exc.search(name):
                    found.append(full)
        return found
    if len(filenames) == 1 and filenames[0].endswith(".tsv"):
        with open(filenames[0]) as fh:
            return [ln.rstrip("\n") for ln in fh if ln.strip()]
    for f in filenames:
        if os.path.isdir(f) or f.endswith(".tsv"):
            raise ValueError(
                "only one directory or tsv file or a list of files can be given")
    return list(filenames)


def parse_spacers(filenames: Iterable[str]) -> tuple[list[SpacerRecord], list[str]]:
    """Parse many files; returns (records with global ordering, basenames)."""
    records: list[SpacerRecord] = []
    sources = []
    any_parsed = False
    for idx, path in enumerate(filenames):
        sources.append(os.path.basename(path))
        recs, fmt = parse_spacer_file(path, idx)
        if fmt != "EMPTY":
            any_parsed = True
        records.extend(recs)
    # reference parity: hasResult is set once any non-empty file's type
    # is detected (ParseSpacer.cpp:186-190) — a parseable file with zero
    # surviving spacers is NOT an error
    if not any_parsed:
        raise ValueError("No spacer sequence was extracted!")
    return records, sources
