"""SetDB: the packed, tensor-native sequence-set database.

This replaces the reference's createsetdb file zoo (seqDB + _h + .lookup
+ .source + _nucl_* + contig<->set maps + member<->set maps + _set_size;
data/createsetdb.sh:39-170) with one artifact of dense arrays:

* contigs:  flat uint8 ASCII + offsets, accession/header strings,
            ``contig_to_set`` (i32) — the set id is the input file index,
            like the reference's fileNumber-as-set-id convention
            (lib/mmseqs/src/util/createdb.cpp .lookup/.source).
* ORFs:     per-ORF contig id, contig coordinates (minus strand has
            from > to), completeness flags, amino-acid and
            reading-direction nucleotide sequences (flat + offsets).
            ORF order is (contig ascending, emission order) — identical
            to the reference's renumbered ORF keys.
* set_size: ORFs per set (reference: result2stats linecount on
            _set_to_member).
* optional taxonomy: set-level and ORF-level taxids.

"Aggregation by set" downstream is plain ``segment_*`` over
``orf_to_set = contig_to_set[orf_contig]``.
"""
import json
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..alphabet import revcomp_ascii
from ..ops.orf import ANY_TO_STOP, START_TO_STOP, find_orfs, orf_nucl_sequence
from ..ops.revcodon import reverse_by_codon_flat
from ..ops.translate import translate_batch
from .fasta import iter_fasta, parse_fasta_header_accession


FORMAT_VERSION = 1


@dataclass
class SetDB:
    # contigs
    contig_data: np.ndarray          # uint8 flat ASCII
    contig_offsets: np.ndarray       # int64 [n_contigs+1]
    contig_accession: list
    contig_header: list
    contig_to_set: np.ndarray        # int32 [n_contigs]
    set_names: list
    # ORFs
    orf_contig: np.ndarray           # int32 [n_orfs]
    orf_from: np.ndarray             # int64 contig coords (inclusive)
    orf_to: np.ndarray               # int64
    orf_complete: np.ndarray         # uint8: bit0=incomplete start, bit1=incomplete end
    orf_aa_data: np.ndarray          # uint8 flat ASCII
    orf_aa_offsets: np.ndarray       # int64 [n_orfs+1]
    orf_nucl_data: np.ndarray        # uint8 flat ASCII (reading direction)
    orf_nucl_offsets: np.ndarray     # int64 [n_orfs+1]
    set_size: np.ndarray             # int32 [n_sets]
    is_control: bool = False
    spacer_mode: bool = False
    # taxonomy (optional)
    set_taxid: Optional[np.ndarray] = None      # int64 [n_sets]
    orf_taxid: Optional[np.ndarray] = None      # int64 [n_orfs]
    contig_taxid: Optional[np.ndarray] = None   # int64 [n_contigs]
    taxdump_path: Optional[str] = None
    # on-disk location when loaded from / saved to a directory; hosts
    # the optional persisted prefilter index (createindex)
    path: Optional[str] = None

    @property
    def n_contigs(self):
        return len(self.contig_offsets) - 1

    @property
    def n_orfs(self):
        return len(self.orf_aa_offsets) - 1

    @property
    def n_sets(self):
        return len(self.set_size)

    def contig_seq(self, i: int) -> np.ndarray:
        return self.contig_data[self.contig_offsets[i]:self.contig_offsets[i + 1]]

    def orf_aa(self, i: int) -> np.ndarray:
        return self.orf_aa_data[self.orf_aa_offsets[i]:self.orf_aa_offsets[i + 1]]

    def orf_aa_encoded(self):
        """All ORF AA sequences in the matrix alphabet, one vectorized
        pass: (flat uint8 indices, offsets int64 [n_orfs+1])."""
        from ..alphabet import encode_aa_array
        return encode_aa_array(self.orf_aa_data), self.orf_aa_offsets

    def orf_nucl(self, i: int) -> np.ndarray:
        if self.orf_nucl_data is not None:
            return self.orf_nucl_data[
                self.orf_nucl_offsets[i]:self.orf_nucl_offsets[i + 1]]
        # derived form: the reading-direction nucleotide sequence is a
        # pure function of (contig bytes, coords, control flag), so it
        # is not persisted (createsetdb skips ~50% of its disk writes);
        # reconstruction mirrors _assemble exactly (U->T substitution,
        # revcomp on minus strand, codon reversal for control DBs)
        f, t = int(self.orf_from[i]), int(self.orf_to[i])
        c = self.contig_seq(int(self.orf_contig[i]))
        if f <= t:
            seq = c[f:t + 1].copy()
        else:
            seq = revcomp_ascii(c[t:f + 1])
        seq[seq == ord("U")] = ord("T")
        seq[seq == ord("u")] = ord("t")
        if self.is_control:
            from ..ops.revcodon import reverse_by_codon
            seq = reverse_by_codon(seq)
        return seq

    def orf_nucl_batch(self, keys) -> dict:
        """{key: reading-direction nucleotide bytes} for many ORFs in
        one native pass — the batched form of orf_nucl()'s derived
        reconstruction (the per-key path costs a contig slice +
        revcomp + U->T per call; at catalog scale the nucl-merge stage
        touches 10^5 distinct ORFs)."""
        keys = list(keys)
        if self.orf_nucl_data is not None:
            return {k: self.orf_nucl(k) for k in keys}
        from ..native import get_lib
        lib = get_lib()
        if lib is None or not keys:
            return {k: self.orf_nucl(k) for k in keys}
        from ..alphabet import _REVCOMP_LUT
        fwd_lut = np.arange(256, dtype=np.uint8)
        fwd_lut[ord("U")] = ord("T")
        fwd_lut[ord("u")] = ord("t")
        rc_lut = _REVCOMP_LUT.copy()
        rc_lut[rc_lut == ord(".")] = ord("N")
        rc_lut = fwd_lut[rc_lut]      # complement then U->T
        k32 = np.ascontiguousarray(keys, dtype=np.int32)
        orf_from = np.ascontiguousarray(self.orf_from, dtype=np.int64)
        orf_to = np.ascontiguousarray(self.orf_to, dtype=np.int64)
        orf_contig = np.ascontiguousarray(self.orf_contig, dtype=np.int32)
        cflat = np.ascontiguousarray(self.contig_data, dtype=np.uint8)
        coff = np.ascontiguousarray(self.contig_offsets, dtype=np.int64)
        lens = np.abs(orf_to[k32] - orf_from[k32]) + 1
        out_off = np.zeros(len(keys) + 1, dtype=np.int64)
        np.cumsum(lens, out=out_off[1:])
        out = np.empty(int(out_off[-1]) + 1, dtype=np.uint8)
        lib.orf_nucl_ranges(
            cflat.ctypes.data, coff.ctypes.data,
            orf_contig.ctypes.data, orf_from.ctypes.data,
            orf_to.ctypes.data,
            k32.ctypes.data, len(keys),
            fwd_lut.ctypes.data, rc_lut.ctypes.data,
            int(self.is_control),
            out_off.ctypes.data, out.ctypes.data)
        return {k: out[out_off[i]:out_off[i + 1]]
                for i, k in enumerate(keys)}

    @property
    def orf_to_set(self) -> np.ndarray:
        # materialized once: the gather is hot in per-orf loops and the
        # source arrays may be mmapped
        cached = getattr(self, "_orf_to_set", None)
        if cached is None:
            cached = np.asarray(self.contig_to_set)[
                np.asarray(self.orf_contig)]
            object.__setattr__(self, "_orf_to_set", cached)
        return cached

    @property
    def orf_aa_lengths(self) -> np.ndarray:
        return np.diff(self.orf_aa_offsets)

    def set_to_first_contig(self) -> np.ndarray:
        """set id -> lowest contig id of the set (findpam's convention,
        src/util/FindPam.cpp:156 reads only the first _set_to_contig entry)."""
        out = np.full(self.n_sets, -1, dtype=np.int64)
        for c in range(self.n_contigs - 1, -1, -1):
            out[self.contig_to_set[c]] = c
        return out

    # ------------------------------------------------------------------ io
    def save(self, path: str):
        os.makedirs(path, exist_ok=True)
        # derived caches (persisted prefilter indexes, masked-target
        # flats, resume stamps) describe the PREVIOUS contents of this
        # path — stale ones must not survive a rebuild
        import shutil
        for name in os.listdir(path):
            if (name.startswith("index_") or name.startswith("mask_")
                    or name == "createsetdb.stamp"):
                full = os.path.join(path, name)
                if os.path.isdir(full):
                    shutil.rmtree(full, ignore_errors=True)
                else:
                    try:
                        os.unlink(full)
                    except OSError:
                        pass
        arrays = dict(
            contig_data=self.contig_data, contig_offsets=self.contig_offsets,
            contig_to_set=self.contig_to_set,
            orf_contig=self.orf_contig, orf_from=self.orf_from,
            orf_to=self.orf_to, orf_complete=self.orf_complete,
            orf_aa_data=self.orf_aa_data, orf_aa_offsets=self.orf_aa_offsets,
            # orf_nucl_data is NOT persisted: it is a pure function of
            # (contig bytes, coords, control flag) and orf_nucl()
            # reconstructs it on demand — skipping it halves the
            # createsetdb disk writes (110 MB at the x500 corpus)
            orf_nucl_offsets=self.orf_nucl_offsets,
            set_size=self.set_size,
        )
        for name in ("set_taxid", "orf_taxid", "contig_taxid"):
            v = getattr(self, name)
            if v is not None:
                arrays[name] = v
        # raw .npy per array: both zlib (~4s/100x corpus) and the npz
        # zipfile's CRC pass (~3s/500x) cost more than the disk space;
        # mmap-friendly on load. tofile releases the GIL, so two writer
        # threads overlap the page-cache copies on this 2-core host.
        adir = os.path.join(path, "arrays")
        os.makedirs(adir, exist_ok=True)
        stale = set(os.listdir(adir)) - {n + ".npy" for n in arrays}
        for name in stale:  # e.g. orf_nucl_data.npy from an old layout
            try:
                os.unlink(os.path.join(adir, name))
            except OSError:
                pass
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=2) as ex:
            list(ex.map(lambda kv: np.save(
                os.path.join(adir, kv[0] + ".npy"), kv[1]),
                sorted(arrays.items(),
                       key=lambda kv: -getattr(kv[1], "nbytes", 0))))
        meta = dict(
            version=FORMAT_VERSION,
            is_control=self.is_control,
            spacer_mode=self.spacer_mode,
            set_names=self.set_names,
            contig_accession=self.contig_accession,
            contig_header=self.contig_header,
            taxdump_path=self.taxdump_path,
        )
        with open(os.path.join(path, "meta.json"), "w") as fh:
            json.dump(meta, fh)

    @classmethod
    def load(cls, path: str) -> "SetDB":
        if not os.path.exists(os.path.join(path, "meta.json")) \
                and os.path.exists(path + ".dbtype"):
            # a reference-built createsetdb bundle (downloaddb catalogs,
            # golden runs): import it transparently
            return cls.from_mmseqs(path)
        with open(os.path.join(path, "meta.json")) as fh:
            meta = json.load(fh)
        if meta.get("version") != FORMAT_VERSION:
            raise ValueError(f"unsupported SetDB version in {path}")
        adir = os.path.join(path, "arrays")
        if os.path.isdir(adir):
            # read-only mmaps: loads are lazy, search touches what it uses
            kw = {f[:-4]: np.load(os.path.join(adir, f), mmap_mode="r")
                  for f in os.listdir(adir) if f.endswith(".npy")}
        else:  # npz layout from earlier revisions
            z = np.load(os.path.join(path, "arrays.npz"))
            kw = {k: z[k] for k in z.files}
        kw.setdefault("orf_nucl_data", None)  # derived; see orf_nucl()
        return cls(
            set_names=meta["set_names"],
            contig_accession=meta["contig_accession"],
            contig_header=meta["contig_header"],
            is_control=meta["is_control"],
            spacer_mode=meta["spacer_mode"],
            taxdump_path=meta.get("taxdump_path"),
            path=path,
            **kw,
        )

    @staticmethod
    def exists(path: str) -> bool:
        return (os.path.exists(os.path.join(path, "meta.json"))
                or (os.path.exists(path + ".dbtype")
                    and os.path.exists(path + "_nucl.dbtype")))

    @classmethod
    def from_mmseqs(cls, prefix: str,
                    taxdump_dir: Optional[str] = None) -> "SetDB":
        """Import a reference-built createsetdb bundle (OUTDB + _nucl +
        _nucl_orf + _h + .lookup/.source + maps + _set_size [+ tax],
        data/createsetdb.sh:39-170) into a SetDB.

        Preserves the reference's own key orders (contig id = _nucl key
        rank, ORF id = OUTDB key rank), so a downloaddb catalog built
        with the reference tool chain runs through predictmatch without
        re-downloading FASTA. The control flag is autodetected by
        comparing a stored ORF entry with the direct contig slice
        (reverseseqbycodon bundles differ exactly by codon reversal).
        """
        from .mmseqs_compat import MMseqsDB
        from ..ops.revcodon import reverse_by_codon

        nucl = MMseqsDB(prefix + "_nucl")
        nucl_h = MMseqsDB(prefix + "_nucl_h")
        orf_db = MMseqsDB(prefix + "_nucl_orf")
        orf_h = MMseqsDB(prefix + "_nucl_orf_h")
        aa_db = MMseqsDB(prefix)

        # ---- contigs (id = key rank; keys ascend in the index)
        n_contigs = len(nucl)
        key_to_rank = {int(k): i for i, k in enumerate(nucl.keys)}
        contig_parts = [np.frombuffer(nucl.get_by_rank(i).rstrip(b"\n"),
                                      dtype=np.uint8)
                        for i in range(n_contigs)]
        contig_data, contig_offsets = _flat(
            [p.copy() for p in contig_parts])
        headers = [nucl_h.get_by_rank(i).decode().rstrip("\n")
                   for i in range(n_contigs)]
        accs = [parse_fasta_header_accession(h) for h in headers]
        contig_to_set = np.zeros(n_contigs, dtype=np.int32)
        for key, acc, file_num in nucl.lookup():
            rank = key_to_rank.get(key)
            if rank is not None:
                contig_to_set[rank] = file_num
                accs[rank] = acc
        sources = nucl.source()
        n_sets = max(num for num, _ in sources) + 1 if sources else 0
        set_names = [""] * n_sets
        for num, name in sources:
            set_names[num] = name

        # ---- ORFs: header 'contigKey \t from±len [\t complete]'
        # (Orf::writeOrfHeader, lib/mmseqs/src/commons/Orf.cpp:440-458)
        n_orfs = len(orf_db)
        if len(aa_db) != n_orfs or len(orf_h) != n_orfs:
            raise ValueError(
                f"{prefix}: AA/ORF DB entry counts disagree "
                f"({len(aa_db)} vs {n_orfs})")
        orf_contig = np.empty(n_orfs, dtype=np.int32)
        orf_from = np.empty(n_orfs, dtype=np.int64)
        orf_to = np.empty(n_orfs, dtype=np.int64)
        orf_complete = np.zeros(n_orfs, dtype=np.uint8)
        for i in range(n_orfs):
            fields = orf_h.get_by_rank(i).rstrip(b"\n").split(b"\t")
            orf_contig[i] = key_to_rank[int(fields[0])]
            span = fields[1]
            sep = span.find(b"+")
            if sep >= 0:
                f = int(span[:sep])
                t = f + int(span[sep + 1:])
            else:
                sep = span.find(b"-", 1)
                f = int(span[:sep])
                t = f - int(span[sep + 1:])
            orf_from[i] = f
            orf_to[i] = t
            if len(fields) > 2:
                orf_complete[i] = int(fields[2])

        aa_parts = [np.frombuffer(aa_db.get_by_rank(i).rstrip(b"\n"),
                                  dtype=np.uint8).copy()
                    for i in range(n_orfs)]
        aa_data, aa_offsets = _flat(aa_parts)
        nucl_parts = [np.frombuffer(orf_db.get_by_rank(i).rstrip(b"\n"),
                                    dtype=np.uint8).copy()
                      for i in range(n_orfs)]
        nucl_data, nucl_offsets = _flat(nucl_parts)

        # ---- control autodetect: stored entry vs direct slice
        is_control = False
        for i in range(n_orfs):
            f, t = int(orf_from[i]), int(orf_to[i])
            c = contig_parts[int(orf_contig[i])]
            sl = (c[f:t + 1].copy() if f <= t
                  else revcomp_ascii(c[t:f + 1]))
            sl[sl == ord("U")] = ord("T")
            sl[sl == ord("u")] = ord("t")
            stored = nucl_parts[i]
            if np.array_equal(stored, sl):
                break
            if np.array_equal(stored, reverse_by_codon(sl)):
                is_control = True
                break
            # ambiguous (e.g. palindromic); try the next ORF
        else:
            if n_orfs:
                raise ValueError(
                    f"{prefix}: ORF entries match neither the contig "
                    "slice nor its codon reversal")

        set_size = np.bincount(contig_to_set[orf_contig],
                               minlength=n_sets).astype(np.int32)
        try:
            ss_db = MMseqsDB(prefix + "_set_size")
            for k, payload in ss_db.items():
                set_size[k] = int(payload.rstrip(b"\n"))
        except FileNotFoundError:
            pass

        db = cls(
            contig_data=contig_data, contig_offsets=contig_offsets,
            contig_accession=accs, contig_header=headers,
            contig_to_set=contig_to_set, set_names=set_names,
            orf_contig=orf_contig, orf_from=orf_from, orf_to=orf_to,
            orf_complete=orf_complete,
            orf_aa_data=aa_data, orf_aa_offsets=aa_offsets,
            orf_nucl_data=nucl_data, orf_nucl_offsets=nucl_offsets,
            set_size=set_size,
            is_control=is_control,
        )

        # ---- taxonomy mappings (createsetdb.sh:146-166)
        def _read_mapping(path, n):
            if not os.path.exists(path):
                return None
            out = np.zeros(n, dtype=np.int64)
            with open(path) as fh:
                for line in fh:
                    parts = line.split("\t")
                    if len(parts) >= 2:
                        k = int(parts[0])
                        if 0 <= k < n:
                            out[k] = int(parts[1])
            return out

        db.set_taxid = _read_mapping(prefix + "_set_mapping", n_sets)
        contig_tax = _read_mapping(prefix + "_nucl_mapping", n_contigs)
        if contig_tax is not None:
            # _nucl_mapping is keyed by contig KEY; remap to rank
            remap = np.zeros(n_contigs, dtype=np.int64)
            for key, rank in key_to_rank.items():
                if 0 <= key < n_contigs:
                    remap[rank] = contig_tax[key]
            db.contig_taxid = remap
        db.orf_taxid = _read_mapping(prefix + "_nucl_orf_mapping", n_orfs)
        db.taxdump_path = taxdump_dir
        return db


def _createdb_shuffle_order(n: int, splits: int = 32) -> np.ndarray:
    """The reference createdb's deterministic 'shuffle': entry id i
    goes to writer split i % 32, splits concatenate in order, keys are
    reassigned sequentially (createdb.cpp:60,219-230). Contig key k
    therefore maps to input entry order[k] of this interleave. The
    numbering is id-load-bearing: the prefilter's hash-bin machinery
    (dup filter, keepMax, tie-break sorts) all key on these ids, so
    byte parity at scale requires the same assignment."""
    return np.concatenate([np.arange(s, n, splits, dtype=np.int64)
                           for s in range(splits)]) if n else \
        np.zeros(0, dtype=np.int64)


def build_setdb_from_fasta(files: list, spacer_mode: bool = False,
                           reverse_fragments: bool = False,
                           orf_min_length: Optional[int] = None,
                           orf_max_length: int = 32734,
                           translation_table: int = 1,
                           tax_mapping_file: Optional[str] = None,
                           taxdump_dir: Optional[str] = None,
                           shuffle: bool = True) -> SetDB:
    """FASTA files -> SetDB. One set per input file. ``shuffle``
    replicates createdb's default stride-32 contig renumbering (see
    _createdb_shuffle_order); parsespacer-built query DBs keep input
    order, like the reference's DB-input createsetdb path."""
    contigs, accs, headers, c2s, set_names = [], [], [], [], []

    from ..native import get_lib
    if spacer_mode and get_lib() is not None:
        # spacer catalogs are many tiny files: read them (threaded),
        # then hand ALL contigs to the one-call native batch scanner in
        # _assemble (the fused per-entry scan pays ~6 Python/ctypes
        # calls per spacer — the wall at 10^4+ sets)
        from ..logging import Progress
        prog = Progress(total=len(files))

        def _read(path):
            out = list(iter_fasta(path))
            prog.update()
            return out
        if len(files) > 1 and (os.cpu_count() or 1) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=min(4, os.cpu_count())) as ex:
                per_file = list(ex.map(_read, files, chunksize=64))
        else:
            per_file = [_read(p) for p in files]
        prog.done()
        for fi, path in enumerate(files):
            set_names.append(os.path.basename(path))
            for e in per_file[fi]:
                contigs.append(e.seq)
                accs.append(parse_fasta_header_accession(e.header))
                headers.append(e.header)
                c2s.append(fi)
        if shuffle and len(contigs) > 1:
            order = _createdb_shuffle_order(len(contigs))
            contigs = [contigs[i] for i in order]
            accs = [accs[i] for i in order]
            headers = [headers[i] for i in order]
            c2s = [c2s[i] for i in order]
        db = _assemble(contigs, accs, headers, c2s, set_names, spacer_mode,
                       reverse_fragments, orf_min_length, orf_max_length,
                       translation_table)
        _attach_taxonomy(db, tax_mapping_file, taxdump_dir)
        return db

    scan = _contig_scanner(spacer_mode, orf_min_length, orf_max_length,
                           translation_table)

    from ..logging import Progress
    prog = Progress(total=len(files))

    def _read_scan(path):
        # one task per file: gz/bz2 decompression AND the C ORF kernel
        # both release the GIL, so read and scan of different files
        # genuinely overlap across the pool (the reference reads with
        # kseq then runs extractorfs omp-parallel; here the two phases
        # fuse into one pipeline)
        entries = list(iter_fasta(path))
        out = entries, [scan(e.seq) for e in entries]
        prog.update()
        return out

    if len(files) > 1 and (os.cpu_count() or 1) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(4, os.cpu_count())) as ex:
            per_file = list(ex.map(_read_scan, files))
    else:
        per_file = [_read_scan(p) for p in files]
    prog.done()
    scanned = []
    for fi, path in enumerate(files):
        set_names.append(os.path.basename(path))
        entries, scans = per_file[fi]
        for e, sc in zip(entries, scans):
            contigs.append(e.seq)
            accs.append(parse_fasta_header_accession(e.header))
            headers.append(e.header)
            c2s.append(fi)
            scanned.append(sc)
    if shuffle and len(contigs) > 1:
        order = _createdb_shuffle_order(len(contigs))
        contigs = [contigs[i] for i in order]
        accs = [accs[i] for i in order]
        headers = [headers[i] for i in order]
        c2s = [c2s[i] for i in order]
        scanned = [scanned[i] for i in order]
    db = _assemble(contigs, accs, headers, c2s, set_names, spacer_mode,
                   reverse_fragments, orf_min_length, orf_max_length,
                   translation_table, scanned=scanned)
    _attach_taxonomy(db, tax_mapping_file, taxdump_dir)
    return db


def build_setdb_from_spacers(records: list, set_names: list,
                             reverse_fragments: bool = False,
                             orf_max_length: int = 32734,
                             translation_table: int = 1,
                             tax_mapping_file: Optional[str] = None,
                             taxdump_dir: Optional[str] = None) -> SetDB:
    """parsespacer records -> SetDB (spacer mode: partial ORFs >= 9 codons)."""
    contigs = [np.frombuffer(r.seq, dtype=np.uint8).copy() for r in records]
    accs = [r.accession for r in records]
    headers = [r.header for r in records]
    c2s = [r.file_idx for r in records]
    db = _assemble(contigs, accs, headers, c2s, set_names, True,
                   reverse_fragments, None, orf_max_length, translation_table)
    _attach_taxonomy(db, tax_mapping_file, taxdump_dir)
    return db


def _attach_taxonomy(db: "SetDB", tax_mapping_file: Optional[str],
                     taxdump_dir: Optional[str]):
    """Set-level taxid mapping by source file name (the reference's
    createsetdb.sh:146-166 awk join on OUTDB.source), propagated to
    contigs and ORFs like the generated _mapping files."""
    if tax_mapping_file is None:
        return
    name_to_taxid = {}
    with open(tax_mapping_file) as fh:
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                name_to_taxid[parts[0]] = int(parts[1])
    db.set_taxid = np.array(
        [name_to_taxid.get(n, 0) for n in db.set_names], dtype=np.int64)
    db.contig_taxid = db.set_taxid[db.contig_to_set]
    db.orf_taxid = db.set_taxid[db.orf_to_set]
    db.taxdump_path = taxdump_dir


def _contig_scanner(spacer_mode, orf_min_length, orf_max_length, table_id):
    """Per-contig ORF scan closure: contig -> (orfs, seq, rc) or None."""
    if spacer_mode:
        min_len = 9 if orf_min_length is None else orf_min_length
        start_mode = ANY_TO_STOP
    else:
        min_len = 30 if orf_min_length is None else orf_min_length
        start_mode = START_TO_STOP

    def _scan_contig(contig):
        orfs = find_orfs(contig, min_length=min_len,
                         max_length=orf_max_length,
                         start_mode=start_mode, table_id=table_id)
        if len(orfs.strand) == 0:
            return None
        # strand sequences computed once per contig (Orf::setSequence);
        # ORF nucls are gathered from this buffer in one pass below.
        # U residues are rare — copy only when the substitution applies
        u_mask = (contig == ord("U")) | (contig == ord("u"))
        if u_mask.any():
            seq = contig.copy()
            seq[contig == ord("U")] = ord("T")
            seq[contig == ord("u")] = ord("t")
        else:
            seq = contig
        rc = revcomp_ascii(seq) if bool((orfs.strand < 0).any()) else None
        # per-ORF arrays precomputed HERE so the worker pool absorbs
        # the numpy work and the serial assemble loop only offsets
        L = len(seq)
        rel_gstart = orfs.frame_from + np.where(orfs.strand < 0, L, 0)
        glen = orfs.frame_to - orfs.frame_from + 1
        complete = (orfs.incomplete_start.astype(np.uint8)
                    | (orfs.incomplete_end.astype(np.uint8) << 1))
        return (seq, rc, rel_gstart.astype(np.int64),
                glen.astype(np.int64), orfs.contig_from, orfs.contig_to,
                complete)

    return _scan_contig


def _assemble(contigs, accs, headers, c2s, set_names, spacer_mode,
              reverse_fragments, orf_min_length, orf_max_length, table_id,
              scanned=None):
    if scanned is None:
        # batched native scan: one C call over all contigs (the
        # per-contig path costs ~6 Python/ctypes calls per contig — the
        # wall for spacer catalogs of 10^4+ tiny records)
        from ..ops.orf import find_orfs_batch
        if spacer_mode:
            b_min = 9 if orf_min_length is None else orf_min_length
            b_mode = ANY_TO_STOP
        else:
            b_min = 30 if orf_min_length is None else orf_min_length
            b_mode = START_TO_STOP
        contig_data, contig_offsets = _flat(contigs)
        batch = find_orfs_batch(contig_data, contig_offsets,
                                min_length=b_min,
                                max_length=orf_max_length,
                                start_mode=b_mode, table_id=table_id)
        if batch is not None:
            orf_contig, orf_from, orf_to, orf_complete, \
                nucl_offsets, nucl_data = batch
            return _finish_setdb(
                contig_data, contig_offsets, accs, headers, c2s,
                set_names, spacer_mode, reverse_fragments, table_id,
                orf_contig, orf_from, orf_to, orf_complete,
                np.ascontiguousarray(nucl_data),
                np.ascontiguousarray(nucl_offsets))
        _scan_contig = _contig_scanner(spacer_mode, orf_min_length,
                                       orf_max_length, table_id)
        # the per-contig scan is dominated by the C ORF kernel (GIL
        # released during the ctypes call), so threads genuinely overlap
        if len(contigs) > 8 and (os.cpu_count() or 1) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=min(4, os.cpu_count())) as ex:
                scanned = list(ex.map(_scan_contig, contigs, chunksize=16))
        else:
            scanned = [_scan_contig(c) for c in contigs]

    orf_contig, orf_from, orf_to, orf_complete = [], [], [], []
    buf_parts, gstart_parts, glen_parts = [], [], []
    buf_off = 0
    for ci, scan in enumerate(scanned):
        if scan is None:
            continue
        seq, rc, rel_gstart, glen, c_from, c_to, complete = scan
        nk = len(glen)
        L = len(seq)
        buf_parts.append(seq)
        if rc is not None:
            buf_parts.append(rc)
        gstart_parts.append(buf_off + rel_gstart)
        glen_parts.append(glen)
        buf_off += L * (2 if rc is not None else 1)
        orf_contig.append(np.full(nk, ci, dtype=np.int32))
        orf_from.append(c_from)
        orf_to.append(c_to)
        orf_complete.append(complete)

    orf_contig = np.concatenate(orf_contig).astype(np.int32) \
        if orf_contig else np.zeros(0, dtype=np.int32)
    orf_from = np.concatenate(orf_from) if orf_from else np.zeros(0, np.int64)
    orf_to = np.concatenate(orf_to) if orf_to else np.zeros(0, np.int64)
    orf_complete = np.concatenate(orf_complete) \
        if orf_complete else np.zeros(0, np.uint8)

    contig_data, contig_offsets = _flat(contigs)
    if gstart_parts:
        gstart = np.ascontiguousarray(np.concatenate(gstart_parts),
                                      dtype=np.int64)
        glen = np.ascontiguousarray(np.concatenate(glen_parts),
                                    dtype=np.int64)
        big = np.concatenate(buf_parts)
        nucl_offsets = np.zeros(len(gstart) + 1, dtype=np.int64)
        np.cumsum(glen, out=nucl_offsets[1:])
        nucl_data = np.empty(nucl_offsets[-1], dtype=np.uint8)
        from ..native import get_lib
        lib = get_lib()
        if lib is not None:
            lib.gather_ranges(big.ctypes.data, gstart.ctypes.data,
                              glen.ctypes.data, len(gstart),
                              nucl_data.ctypes.data)
        else:
            src = np.repeat(gstart - nucl_offsets[:-1], glen) \
                + np.arange(nucl_offsets[-1], dtype=np.int64)
            nucl_data = big[src]
    else:
        nucl_data = np.zeros(0, dtype=np.uint8)
        nucl_offsets = np.zeros(1, dtype=np.int64)
    return _finish_setdb(contig_data, contig_offsets, accs, headers, c2s,
                         set_names, spacer_mode, reverse_fragments,
                         table_id, orf_contig,
                         np.asarray(orf_from, dtype=np.int64),
                         np.asarray(orf_to, dtype=np.int64),
                         np.asarray(orf_complete, dtype=np.uint8),
                         nucl_data, nucl_offsets)


def _finish_setdb(contig_data, contig_offsets, accs, headers, c2s,
                  set_names, spacer_mode, reverse_fragments, table_id,
                  orf_contig, orf_from, orf_to, orf_complete,
                  nucl_data, nucl_offsets):
    c2s = np.asarray(c2s, dtype=np.int32)
    set_size = np.bincount(c2s[orf_contig],
                           minlength=len(set_names)).astype(np.int32)
    if reverse_fragments:
        nucl_data = reverse_by_codon_flat(nucl_data, nucl_offsets)
    # ORF lengths are whole codons, so the batch translation covers
    # every ORF exactly (no empty-AA drop case)
    aa_data, aa_offsets = translate_batch(nucl_data, nucl_offsets, table_id)
    return SetDB(
        contig_data=contig_data, contig_offsets=contig_offsets,
        contig_accession=accs, contig_header=headers,
        contig_to_set=c2s, set_names=list(set_names),
        orf_contig=orf_contig,
        orf_from=orf_from,
        orf_to=orf_to,
        orf_complete=orf_complete,
        orf_aa_data=aa_data, orf_aa_offsets=aa_offsets,
        orf_nucl_data=nucl_data, orf_nucl_offsets=nucl_offsets,
        set_size=set_size,
        is_control=bool(reverse_fragments),
        spacer_mode=bool(spacer_mode),
    )


def _flat(parts):
    if not parts:
        return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    offsets = np.zeros(len(parts) + 1, dtype=np.int64)
    np.cumsum([len(p) for p in parts], out=offsets[1:])
    return np.concatenate(parts, dtype=np.uint8), offsets
