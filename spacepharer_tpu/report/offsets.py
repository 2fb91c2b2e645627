"""Best-hit truncation and ORF-to-contig coordinate projection.

Parity targets:
  truncatebesthits (src/util/TruncateBestHits.cpp:15-101): keep best-hit
    rows with logP < log(1/(querySetSize+1)); rearrange columns into the
    11-col hit record [tkey, eval, seqId, exp(logP), qs..tl, bt].
  offsetalignment --search-type 4 (lib/mmseqs/src/util/offsetalignment.cpp):
    per query contig, collect its ORFs' rows, project aa coordinates x3
    through the ORF locations onto contig coordinates (minus strand
    flips, +2 codon end), set ORF-position columns, backtrace counts x3,
    update lengths to contig lengths, stable-sort by Matcher::compareHits.
"""
import math

from ..stats.aggregation import fmt_e3
from ..ops.align import format_seq_id


def truncate_best_hits(entries: dict, query_set_size_of: dict) -> dict:
    """{query_orf: aggregated rows} -> truncated, rearranged rows."""
    out = {}
    for qkey, rows in entries.items():
        set_size = query_set_size_of[qkey]
        log_thr = math.log(1.0 / (set_size + 1))
        kept = []
        for row in rows:
            log_pval = float(row[1])
            if log_pval >= log_thr:
                continue
            kept.append([row[0], row[3], row[2], fmt_e3(math.exp(log_pval))]
                        + list(row[4:11]))
        out[qkey] = kept
    return out


def _parse_score_int(s: str) -> int:
    """fast_atoi semantics: leading digits only (handles '-')."""
    i = 0
    neg = False
    if s and s[0] == "-":
        neg = True
        i = 1
    v = 0
    while i < len(s) and s[i].isdigit():
        v = v * 10 + int(s[i])
        i += 1
    return -v if neg else v


def _x3_backtrace(cbt: str) -> str:
    out = []
    cnt = 0
    for c in cbt:
        if c.isdigit():
            cnt = cnt * 10 + int(c)
        else:
            out.append(f"{cnt * 3 if cnt else 3}{c}")
            cnt = 0
    return "".join(out)


def offset_alignments(truncated: dict, query_db, target_db) -> dict:
    """Project per-ORF hit rows onto contig coordinates.

    truncated: {query_orf_key: rows}; query_db/target_db: SetDB.
    Returns {query_contig_key: merged rows (17 fields incl. 4 ORF-pos
    columns and the x3 backtrace)} sorted like the reference.
    """
    out = {}
    # group query ORFs per contig in ascending ORF key order
    orf_by_contig = {}
    for okey in range(query_db.n_orfs):
        orf_by_contig.setdefault(int(query_db.orf_contig[okey]), []).append(okey)

    t_from = target_db.orf_from
    t_to = target_db.orf_to
    t_contig = target_db.orf_contig

    for ckey, orfs in sorted(orf_by_contig.items()):
        results = []
        for okey in orfs:
            rows = truncated.get(okey, [])
            q_from = int(query_db.orf_from[okey])
            q_to = int(query_db.orf_to[okey])
            q_minus = q_from > q_to
            for row in rows:
                t_orf = int(row[0])
                score = _parse_score_int(row[1])
                seq_id = float(row[2])
                evalue = float(row[3])
                qs, qe = int(row[4]) * 3, int(row[5]) * 3
                ts, te = int(row[7]) * 3, int(row[8]) * 3
                bt = row[10] if len(row) > 10 else ""

                tf = int(t_from[t_orf])
                tt = int(t_to[t_orf])
                if tf > tt:  # minus strand target ORF
                    new_ts = tf - ts
                    new_te = tf - te - 2
                else:
                    new_ts = tf + ts
                    new_te = tf + te + 2
                if q_minus:
                    new_qs = q_from - qs
                    new_qe = q_from - qe - 2
                else:
                    new_qs = q_from + qs
                    new_qe = q_from + qe + 2

                t_ck = int(t_contig[t_orf])
                results.append(dict(
                    dbKey=t_ck, score=score, seqId=seq_id, eval=evalue,
                    qStart=new_qs, qEnd=new_qe,
                    qLen=int(query_db.contig_offsets[ckey + 1]
                             - query_db.contig_offsets[ckey]),
                    tStart=new_ts, tEnd=new_te,
                    tLen=int(target_db.contig_offsets[t_ck + 1]
                             - target_db.contig_offsets[t_ck]),
                    qOrfStart=q_from, qOrfEnd=q_to,
                    tOrfStart=tf, tOrfEnd=tt,
                    bt=_x3_backtrace(bt)))
        # Matcher::compareHits: eval asc, score desc, dbLen asc, dbKey asc
        results.sort(key=lambda r: (r["eval"], -r["score"], r["tLen"], r["dbKey"]))
        rows = []
        for r in results:
            rows.append([
                str(r["dbKey"]), str(r["score"]), format_seq_id(r["seqId"]),
                f"{r['eval']:.3E}", str(r["qStart"]), str(r["qEnd"]),
                str(r["qLen"]), str(r["tStart"]), str(r["tEnd"]),
                str(r["tLen"]), str(r["qOrfStart"]), str(r["qOrfEnd"]),
                str(r["tOrfStart"]), str(r["tOrfEnd"]), r["bt"]])
        out[ckey] = rows
    return out
