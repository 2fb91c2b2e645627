"""Alignment-DB -> column-formatted rows (convertalis equivalent).

Parity target: convertalignments.cpp with SpacePHARER's column list
``tsetid,query,qset,target,evalue,qstart,qend,qlen,tstart,tend,qaln,
taln,taxid`` (data/predictmatch.sh:145-147): coordinates are 1-based,
qaln/taln are gapped nucleotide strings walked from the contig
sequences (reverse-complement for minus-strand sides), taxid comes from
the target contig's taxonomy mapping.
"""
import numpy as np

from ..alphabet import complement_ascii
from ..ops.align import decompress_backtrace


def _aln_string(contig: np.ndarray, start: int, bt: str, is_target: bool,
                reverse_strand: bool) -> str:
    out = []
    pos = 0
    for op in bt:
        if reverse_strand:
            ch = chr(complement_ascii(contig[start - pos:start - pos + 1])[0])
        else:
            ch = chr(contig[start + pos])
        if op == "M":
            out.append(ch)
            pos += 1
        elif op == "I":
            if is_target:
                out.append("-")
            else:
                out.append(ch)
                pos += 1
        else:  # D
            if is_target:
                out.append(ch)
                pos += 1
            else:
                out.append("-")
    return "".join(out)


def convert_alignments(offset_entries: dict, query_db, target_db,
                       with_taxid: bool) -> dict:
    """{query_contig: 15-col rows} -> {query_contig: formatted rows}."""
    out = {}
    t_taxid = target_db.contig_taxid if with_taxid else None
    for ckey, rows in offset_entries.items():
        q_contig = query_db.contig_seq(ckey)
        q_acc = query_db.contig_accession[ckey]
        q_set = query_db.set_names[int(query_db.contig_to_set[ckey])]
        new_rows = []
        for row in rows:
            t_ck = int(row[0])
            evalue = row[3]
            qs, qe = int(row[4]), int(row[5])
            ts, te = int(row[7]), int(row[8])
            bt = decompress_backtrace(row[14])
            t_contig = target_db.contig_seq(t_ck)
            qaln = _aln_string(q_contig, qs, bt, False, qs > qe)
            taln = _aln_string(t_contig, ts, bt, True, ts > te)
            t_set = int(target_db.contig_to_set[t_ck])
            fields = [
                str(t_set), q_acc, q_set, target_db.contig_accession[t_ck],
                evalue, str(qs + 1), str(qe + 1), row[6],
                str(ts + 1), str(te + 1), qaln, taln,
            ]
            if with_taxid:
                fields.append(str(int(t_taxid[t_ck])) if t_taxid is not None else "0")
            else:
                fields.append("-")
            new_rows.append(fields)
        out[ckey] = new_rows
    return out


def merge_entries_by_set(entries: dict, groups: dict) -> dict:
    """mergeresultsbyset: {member: rows} + {set: [members asc]} ->
    {set: concatenated rows}."""
    out = {}
    for skey, members in sorted(groups.items()):
        rows = []
        for m in members:
            rows.extend(entries.get(m, []))
        out[skey] = rows
    return out
