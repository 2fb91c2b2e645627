"""Reader for MMseqs2/SpacePHARER key-value databases.

Used for (a) validating this framework against reference-produced
databases in tests and (b) importing existing setDBs built with the
reference tool chain.

Format (lib/mmseqs/src/commons/DBReader.h / DBWriter.h):
  <name>          data: '\\0'-terminated entries (may be split over
                  <name>.0 .. <name>.N when written multi-threaded;
                  index offsets are global over the concatenation)
  <name>.index    text lines: key \\t offset \\t length   (length incl. '\\0')
  <name>.dbtype   4-byte little-endian type id
  <name>.lookup   key \\t accession \\t fileNumber
  <name>.source   fileNumber \\t fileName

Compressed databases (dbtype bit 31, DBWriter --compressed) store each
entry as [u32 cSize][cSize bytes][flag]: the bytes are a zstd stream
when the byte AT dataStart[cSize] is 0, else a raw copy
(DBReader::getDataCompressed, lib/mmseqs/src/commons/DBReader.cpp:
512-539). Decompression rides the system libzstd via ctypes.
"""
import ctypes
import os
from functools import cached_property

import numpy as np

_ZSTD = None


def _zstd():
    """System libzstd handle (simple one-shot API), or None."""
    global _ZSTD
    if _ZSTD is None:
        try:
            lib = ctypes.CDLL("libzstd.so.1")
        except OSError:
            _ZSTD = False
            return None
        lib.ZSTD_getFrameContentSize.restype = ctypes.c_uint64
        lib.ZSTD_getFrameContentSize.argtypes = [ctypes.c_void_p,
                                                 ctypes.c_size_t]
        lib.ZSTD_findFrameCompressedSize.restype = ctypes.c_size_t
        lib.ZSTD_findFrameCompressedSize.argtypes = [ctypes.c_void_p,
                                                     ctypes.c_size_t]
        lib.ZSTD_decompress.restype = ctypes.c_size_t
        lib.ZSTD_decompress.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                        ctypes.c_void_p, ctypes.c_size_t]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                      ctypes.c_void_p, ctypes.c_size_t,
                                      ctypes.c_int]
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        _ZSTD = lib
    return _ZSTD or None


def _zstd_decompress_frames(blob: bytes) -> bytes:
    """Decompress a concatenation of zstd frames (the reference writes
    one entry as a stream of independent blocks/frames)."""
    lib = _zstd()
    if lib is None:
        raise RuntimeError("compressed MMseqs DB but no system libzstd")
    out = []
    view = memoryview(blob)
    while len(view):
        src = bytes(view)
        fsize = lib.ZSTD_findFrameCompressedSize(src, len(src))
        if lib.ZSTD_isError(fsize):
            raise ValueError("corrupt zstd frame in compressed DB entry")
        csize = lib.ZSTD_getFrameContentSize(src, fsize)
        if csize in (2 ** 64 - 1, 2 ** 64 - 2):  # unknown/error
            csize = max(len(src) * 32, 1 << 16)
        # When the frame header omits the content size the guess above
        # can be short for very high-ratio frames: retry with doubled
        # buffers instead of failing (cap: 1 GiB per frame).
        while True:
            dst = ctypes.create_string_buffer(int(csize))
            n = lib.ZSTD_decompress(dst, int(csize), src, fsize)
            if not lib.ZSTD_isError(n):
                break
            if csize >= 1 << 30:
                raise ValueError("zstd decompression failed")
            csize = int(csize) * 2
        out.append(dst.raw[:n])
        view = view[fsize:]
    return b"".join(out)

DBTYPE_AA = 0
DBTYPE_NUCL = 1


def write_mmseqs_db(path: str, entries, dbtype: int,
                    compressed: bool = False):
    """Write an MMseqs2-format key-value DB (data + .index + .dbtype)
    with sequential keys — the DBWriter output layout, for drop-in
    interop (e.g. the reference's own regression script reading our
    parsespacer output). ``entries`` are payload bytes WITHOUT the
    trailing newline/terminator; each is stored as payload + b'\\n\\0'
    like the reference's sequence/header writers.

    ``compressed`` emits the DBWriter --compressed per-entry layout
    (DBWriter.cpp:280-389): [u32 cSize][zstd frame][\\0] with the
    UNCOMPRESSED length (+1 for the flag byte) in the index, dbtype
    bit 31 set; entries under 60 bytes are stored raw with a 0xFF
    flag, mirroring the reference's small-entry escape."""
    lib = _zstd() if compressed else None
    if compressed and lib is None:
        raise RuntimeError("--compressed write needs system libzstd")
    with open(path, "wb") as data, open(path + ".index", "w") as idx:
        off = 0
        for key, payload in enumerate(entries):
            if compressed:
                body = bytes(payload) + b"\n"
                if len(body) < 60:
                    blob = (len(body).to_bytes(4, "little") + body
                            + b"\xff")
                else:
                    bound = lib.ZSTD_compressBound(len(body))
                    dst = ctypes.create_string_buffer(bound)
                    n = lib.ZSTD_compress(dst, bound, body, len(body), 3)
                    if lib.ZSTD_isError(n):
                        raise ValueError("zstd compression failed")
                    blob = (int(n).to_bytes(4, "little") + dst.raw[:n]
                            + b"\0")
                length = len(body) + 1
            else:
                blob = bytes(payload) + b"\n\0"
                length = len(blob)
            data.write(blob)
            idx.write(f"{key}\t{off}\t{length}\n")
            off += len(blob)
    with open(path + ".dbtype", "wb") as fh:
        raw = int(dbtype) | ((1 << 31) if compressed else 0)
        fh.write(raw.to_bytes(4, "little"))
DBTYPE_PREFILTER_RES = 7
DBTYPE_ALIGNMENT_RES = 5
DBTYPE_GENERIC = 12
DBTYPE_OMIT_FILE = 13


class MMseqsDB:
    """Random-access reader for one MMseqs database."""

    def __init__(self, path: str):
        self.path = path
        data_parts = []
        if os.path.exists(path):
            data_parts.append(path)
        else:
            i = 0
            while os.path.exists(f"{path}.{i}"):
                data_parts.append(f"{path}.{i}")
                i += 1
        if not data_parts:
            raise FileNotFoundError(path)
        blobs = []
        for p in data_parts:
            with open(p, "rb") as fh:
                blobs.append(fh.read())
        self.data = b"".join(blobs)
        keys, offs, lens = [], [], []
        with open(path + ".index") as fh:
            for line in fh:
                k, o, l = line.rstrip("\n").split("\t")
                keys.append(int(k))
                offs.append(int(o))
                lens.append(int(l))
        self.keys = np.array(keys, dtype=np.int64)
        self.offsets = np.array(offs, dtype=np.int64)
        self.lengths = np.array(lens, dtype=np.int64)

    @cached_property
    def _dbtype_raw(self) -> int:
        try:
            with open(self.path + ".dbtype", "rb") as fh:
                return int.from_bytes(fh.read(4), "little")
        except FileNotFoundError:
            return -1

    @cached_property
    def dbtype(self) -> int:
        raw = self._dbtype_raw
        return raw if raw < 0 else raw & 0xFF

    @cached_property
    def compressed(self) -> bool:
        """DBReader::isCompressed: dbtype bit 31 (DBReader.cpp:994)."""
        return self._dbtype_raw > 0 and bool(self._dbtype_raw & (1 << 31))

    def __len__(self):
        return len(self.keys)

    def get(self, key: int) -> bytes:
        """Entry payload by key, without the trailing '\\0'."""
        idx = np.searchsorted(self.keys, key)
        if idx >= len(self.keys) or self.keys[idx] != key:
            raise KeyError(key)
        return self.get_by_rank(int(idx))

    def get_by_rank(self, i: int) -> bytes:
        o, l = int(self.offsets[i]), int(self.lengths[i])
        if self.compressed:
            # [u32 cSize][payload][flag]: flag byte 0 = zstd stream,
            # else raw copy (getDataCompressed, DBReader.cpp:512-539)
            c_size = int.from_bytes(self.data[o:o + 4], "little")
            payload = self.data[o + 4:o + 4 + c_size]
            if self.data[o + 4 + c_size] == 0:
                return _zstd_decompress_frames(payload)
            return payload
        return self.data[o:o + l - 1]

    def text(self, key: int) -> str:
        return self.get(key).decode("ascii", "replace")

    def seq(self, key: int) -> bytes:
        """Sequence payload with the trailing newline stripped."""
        return self.get(key).rstrip(b"\n")

    def items(self):
        for i, k in enumerate(self.keys):
            yield int(k), self.get_by_rank(i)

    def lookup(self):
        """Parse <name>.lookup -> list of (key, accession, fileNum)."""
        out = []
        with open(self.path + ".lookup") as fh:
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                out.append((int(parts[0]), parts[1], int(parts[2])))
        return out

    def source(self):
        out = []
        with open(self.path + ".source") as fh:
            for line in fh:
                num, name = line.rstrip("\n").split("\t")
                out.append((int(num), name))
        return out


def read_tsv_result(db: MMseqsDB):
    """Parse a result DB into {key: [line-split-fields, ...]}."""
    out = {}
    for k, payload in db.items():
        rows = []
        for line in payload.decode("ascii").split("\n"):
            if line:
                rows.append(line.split("\t"))
        out[k] = rows
    return out
