"""Protospacer-adjacent-motif scanning.

Parity target: findpam (src/util/FindPam.cpp:47-265): extract
+-flanking_len nt around each protospacer from the target set's *first*
contig (the reference reads only the first _set_to_contig entry,
FindPam.cpp:156), 4 strand/orientation cases, match the curated PAM
motif lists (5' motifs must end flush at the protospacer, 3' motifs
must start flush), and append "5'|3'" columns for the forward and
reverse-complement orientations.
"""
import re

import numpy as np

from ..alphabet import complement_ascii

# 5' motifs in priority order (regex, first match anywhere, but the
# match must END at flanking_len). Leenay & Beisel 2017 (FindPam.cpp:31-77).
_FIVE = [re.compile(p) for p in
         ("[TC]C[ACGT]", "CC[GAT]", "[TC][TC]C", "CC", "A[AT]G", "TT[ACGT]")]
_THREE = [re.compile(p) for p in
          ("[ACGT]GG", "[ACGT][ACGT]AGAA", "[ACGT][ACGT]G[AG][AG]T",
           "[ACGT][ACGT][ACGT][ACGT]G[AT][AT]T")]


def search_pam(three_prime: str, five_prime: str, flanking_len: int):
    five = "-"
    for pat in _FIVE:
        m = pat.search(five_prime)
        if m and m.end() == flanking_len:
            five = m.group(0)
            break
    three = "-"
    for pat in _THREE:
        m = pat.search(three_prime)
        if m and m.start() == 0:
            three = m.group(0)
            break
    return five, three


def _revcomp_str(s: str) -> str:
    arr = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
    return complement_ascii(arr)[::-1].tobytes().decode("ascii")


def find_pam(aln_entries: dict, target_db, flanking_len: int = 10) -> dict:
    """Append PAM columns to merged alignment rows ({set: rows}).

    Like the reference (FindPam.cpp:156 reads only the first
    _set_to_contig line), flanks always come from the set's FIRST
    contig — correct for single-contig sets (the supported catalogs).
    For hits on later contigs the reference reads past the first
    contig's DB entry into adjacent memory (undefined bytes); here
    out-of-bounds flank positions are clamped instead, so PAM columns
    can differ from the reference's garbage in that case."""
    set_to_first_contig = target_db.set_to_first_contig()
    out = {}
    for skey, rows in aln_entries.items():
        new_rows = []
        for row in rows:
            tset = int(row[0])
            contig = target_db.contig_seq(int(set_to_first_contig[tset]))
            qs = int(row[5]) - 1
            qe = int(row[6]) - 1
            qlen = int(row[7])
            ts = int(row[8]) - 1
            te = int(row[9]) - 1
            q_rev = qs > qe
            t_rev = ts > te

            if not q_rev and not t_rev:
                five_end = ts - qs
                three_end = te + (qlen - qe)
                # reference loops use size_t: a start below 0 wraps and
                # the loop is skipped (empty flank); past-the-end reads
                # are unspecified OOB there — here they truncate
                five = (contig[five_end - flanking_len:five_end]
                        if five_end >= flanking_len else contig[0:0])
                three = contig[max(three_end, 0):
                               max(three_end + flanking_len, 0)]
                five_s = five.tobytes().decode()
                three_s = three.tobytes().decode()
            elif not q_rev and t_rev:
                three_end = te - (qlen - qe)
                five_end = ts + qs
                five_s = "".join(
                    chr(complement_ascii(contig[i:i + 1])[0])
                    for i in range(five_end + flanking_len, five_end, -1)
                    if 0 <= i < len(contig))
                three_s = "".join(
                    chr(complement_ascii(contig[i:i + 1])[0])
                    for i in range(three_end, three_end - flanking_len, -1)
                    if 0 <= i < len(contig))
            elif q_rev and not t_rev:
                five_end = te + qe
                three_end = ts - (qlen - qs)
                five_s = "".join(
                    chr(complement_ascii(contig[i:i + 1])[0])
                    for i in range(five_end + flanking_len, five_end, -1)
                    if 0 <= i < len(contig))
                three_s = "".join(
                    chr(complement_ascii(contig[i:i + 1])[0])
                    for i in range(three_end, three_end - flanking_len, -1)
                    if 0 <= i < len(contig))
            else:
                five_end = te - qe
                three_end = ts + (qlen - qs)
                five_s = (contig[five_end - flanking_len:five_end]
                          if five_end >= flanking_len
                          else contig[0:0]).tobytes().decode()
                three_s = contig[max(three_end, 0):
                                 max(three_end + flanking_len, 0)
                                 ].tobytes().decode()

            fwd5, fwd3 = search_pam(three_s, five_s, flanking_len)
            rev3 = _revcomp_str(five_s)
            rev5 = _revcomp_str(three_s)
            r5, r3 = search_pam(rev3, rev5, flanking_len)
            new_rows.append(list(row) + [f"{fwd5}|{fwd3}", f"{r5}|{r3}"])
        out[skey] = new_rows
    return out
