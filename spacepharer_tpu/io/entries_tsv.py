"""Entry-table TSV interchange for the expert commands.

The reference's expert modules read and write MMseqs result DBs whose
records are blocks of tab-separated text lines keyed by an integer
entry key (lib/mmseqs/src/commons/DBReader.h). The file-level
equivalent here is a flat TSV: one line per record,
``<entry_key>\t<field1>\t<field2>...``. Keys may repeat (multi-row
entries); row order within a key is preserved. This round-trips the
in-memory model used across the pipeline ({int: [[str, ...], ...]}).
"""


def read_entries(path: str) -> dict:
    """TSV -> {int key: [row fields...]} preserving key and row order.

    A line with only a key (no fields) declares an empty entry, the
    analog of an empty DB record — it ensures the key exists.
    """
    entries = {}
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split("\t")
            key = int(parts[0])
            entries.setdefault(key, [])
            if len(parts) > 1:
                entries[key].append(parts[1:])
    return entries


def write_entries(entries: dict, path: str):
    """{int key: rows} -> TSV (ascending key). Empty entries emit a
    bare-key line so read_entries restores them."""
    with open(path, "w") as fh:
        for key in sorted(entries.keys()):
            rows = entries[key]
            if not rows:
                fh.write(f"{key}\n")
                continue
            for row in rows:
                fh.write(str(key) + "\t" + "\t".join(str(f) for f in row)
                         + "\n")


def single_row_entries(entries: dict) -> dict:
    """{key: [one row]} -> {key: row} (taxonomy tables are one-row)."""
    return {k: rows[0] for k, rows in entries.items() if rows}
