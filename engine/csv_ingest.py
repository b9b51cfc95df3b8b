"""CSV-parity ingest front-end (M6): the reference's adaptive pipeline
(``backend/app/services/csv_handler.py:114-148``) re-expressed for Ray.

Per-file semantics (identical observable behavior to the reference):

1. detect dialect on an 8 KiB sample (:mod:`engine.infer`)
2. classify layout on a 4 KiB / 20-row sample
3. vertical -> :func:`engine.transpose.transpose_vertical`;
   horizontal -> DictReader-equivalent with per-cell sanitization
   (``_sanitize_row``, ``csv_handler.py:100-111``: drop ragged
   ``None``-keyed extras, strip field names, ``None`` -> ``""``,
   drop all-empty rows)
4. optional positional group-merge by a user-chosen ``id_field``
   (``_group_records_by_id``, ``csv_handler.py:66-97``)

Distribution model: CSV parsing is ordered within a file (the
transposer is a session window over file order, SURVEY 2.9), so the
unit of parallelism is the FILE: one Ray task parses one file into an
Arrow all-string table held in the object store; the driver only sees
the per-file field lists (tiny), computes the first-seen-order unified
schema (schema evolution), and the resulting ``Dataset`` is assembled
from the object refs without data ever moving through the driver.
"""

from __future__ import annotations

import csv
import io
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import ray

from engine.infer import detect_dialect, is_vertical_layout
from engine.sanitize import sanitize_cell
from engine.transpose import transpose_vertical


# ---------------------------------------------------------------------------
# pure-Python reference-parity core (unit-testable without Ray)
# ---------------------------------------------------------------------------

def sanitize_row(row: Dict) -> Optional[Dict]:
    """``_sanitize_row`` parity: strip field names, drop falsy field
    names and ``None``-keyed ragged extras, ``None`` values -> ``""``,
    all-empty row -> dropped (returns None)."""
    out: Dict[str, str] = {}
    for field, value in row.items():
        if field:
            out[field.strip()] = sanitize_cell(value if value is not None else "")
    return out or None


def group_records(records: List[Dict], id_field: Optional[str]) -> List[Dict]:
    """``_group_records_by_id`` parity: positional first-seen anchoring,
    non-empty-wins overwrite, id field never overwritten, falsy-id rows
    pass through in place."""
    if not id_field:
        return records
    key = id_field.strip()
    if not key:
        return records
    anchors: Dict[str, Dict] = {}
    ordered: List[Dict] = []
    for record in records:
        rid = record.get(key)
        if not rid:
            ordered.append(dict(record))
            continue
        if rid not in anchors:
            anchors[rid] = dict(record)
            ordered.append(anchors[rid])
            continue
        for field, value in record.items():
            if field == key:
                continue
            if value not in ("", None):
                anchors[rid][field] = value
    return ordered


def parse_csv_text(
    content: str, id_field: Optional[str] = None
) -> Tuple[List[Dict], List[str]]:
    """Full adaptive parse of one CSV text (``_parse_csv_sync`` parity)."""
    if not content:
        return [], []
    dialect = detect_dialect(content)
    if is_vertical_layout(content, dialect):
        records, fields = transpose_vertical(content, dialect)
        return group_records(records, id_field), fields

    records = []
    fields: List[str] = []
    try:
        reader = csv.DictReader(
            io.StringIO(content), delimiter=dialect.delimiter, quotechar=dialect.quotechar
        )
        if reader.fieldnames:
            fields = [f.strip() for f in reader.fieldnames if f]
        for raw in reader:
            # ragged extras land under the None key; sanitize_row's
            # `if field` drops them (reference parity -- fuzz-tested)
            row = sanitize_row(raw)
            if row:
                records.append(row)
    except csv.Error:
        pass
    return group_records(records, id_field), fields


def records_to_arrow(records: List[Dict], fields: List[str]) -> pa.Table:
    """Records + ordered fields -> all-string Arrow table; missing keys
    become empty cells (DictWriter semantics, ``file_service.py:16-21``)."""
    cols = {f: [r.get(f, "") for r in records] for f in fields}
    return pa.table({f: pa.array(cols[f], type=pa.string()) for f in fields})


DEFAULT_MAX_BYTES = 50 * 1024 * 1024  # reference cap, config.py:30


#: magic numbers of common binary formats masquerading as .csv
_BINARY_MAGICS = (
    b"PK\x03\x04",  # zip / xlsx
    b"%PDF",
    b"\x89PNG",
    b"GIF8",
    b"PAR1",  # parquet
    b"\x1f\x8b",  # gzip
    b"\xff\xd8\xff",  # jpeg
)


def _sniff_content(path: str, probe_bytes: int = 4096) -> Optional[str]:
    """Content sniff: the engine's analog of the reference's
    content-type gate (``validators.py:20-28`` rejects non ``text/csv``
    uploads). A filesystem path has no declared MIME type, so we sniff
    the leading bytes: known binary magic numbers and NUL bytes mean
    "not CSV". Returns a rejection reason or None."""
    with open(path, "rb") as f:
        head = f.read(probe_bytes)
    for magic in _BINARY_MAGICS:
        if head.startswith(magic):
            return f"content: binary magic {magic!r}"
    if b"\x00" in head:
        return "content: NUL bytes (binary file)"
    return None


def validate_csv_paths(paths: List[str], max_bytes: int = DEFAULT_MAX_BYTES):
    """Reject-fast input admission (M5; reference ``validators.py:10-30``
    extension + content-type check, ``file_repository.py:20-21`` size
    cap). Returns ``(accepted, rejected)`` where rejected entries carry
    the reason -- driver-side, before any task is launched. The content
    sniff reads only the first 4 KB of each file (metadata-scale IO; at
    many-file scale fan it out like the footer scan)."""
    import os

    accepted, rejected = [], []
    for p in paths:
        if not p.lower().endswith(".csv"):
            rejected.append((p, "extension: not .csv"))
            continue
        try:
            size = os.path.getsize(p)
        except OSError as e:
            rejected.append((p, f"stat: {e}"))
            continue
        if size > max_bytes:
            rejected.append((p, f"size {size} > cap {max_bytes}"))
            continue
        try:
            reason = _sniff_content(p)
        except OSError as e:
            rejected.append((p, f"read: {e}"))
            continue
        if reason:
            rejected.append((p, reason))
            continue
        accepted.append(p)
    return accepted, rejected


# ---------------------------------------------------------------------------
# Ray front-end
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=1, num_returns=2)
def _parse_file(path: str, id_field: Optional[str]):
    """One file -> (arrow table ref, meta ref). BOM-tolerant decode;
    decode failure quarantines the file (error recorded, job continues)
    rather than aborting -- the engine's dead-letter version of the
    reference's hard ValueError (``file_service.py:36-39``).

    Two return objects so the driver fetches only the tiny meta (field
    list / error); the data table stays in the object store.
    """
    try:
        with open(path, "rb") as f:
            raw = f.read()
        content = raw.decode("utf-8-sig")
    except (OSError, UnicodeDecodeError) as e:
        # quarantine IO failures too (file deleted/unreadable between
        # validation and execution) -- one bad file must not abort the
        # whole multi-file ingest. The path rides its own meta field so
        # consumers never re-parse it out of the message (paths may
        # contain ':').
        return pa.table({}), {"fields": [], "error": str(e), "path": path}
    records, fields = parse_csv_text(content, id_field)
    return records_to_arrow(records, fields), {"fields": fields, "error": None, "path": path}


@ray.remote(num_cpus=1)
def _align_task(table: pa.Table, schema: pa.Schema) -> pa.Table:
    from engine.jobs import align_to_schema

    return align_to_schema(table, schema)


def ingest_csv(
    paths: List[str], id_field: Optional[str] = None
) -> Tuple["ray.data.Dataset", List[str], List[str]]:
    """Parse many CSV files in parallel into one schema-evolved Dataset.

    Returns ``(dataset, unified_fields, quarantined_errors)``. Field
    order is first-seen across files in the given path order (the
    reference's dynamic schema growth, generalized across files). Only
    per-file field lists travel to the driver; row data moves object
    store -> align task -> Dataset blocks.
    """
    import ray.data

    pairs = [_parse_file.remote(p, id_field) for p in paths]
    metas = ray.get([m for _, m in pairs])
    unified: List[str] = []
    errors: list = []  # (path, message) pairs
    for m in metas:
        if m["error"]:
            errors.append((m["path"], m["error"]))
        else:
            for f in m["fields"]:
                if f not in unified:
                    unified.append(f)
    schema = pa.schema([(f, pa.string()) for f in unified])
    refs = [
        _align_task.remote(tref, schema)
        for (tref, _), m in zip(pairs, metas)
        if not m["error"]
    ]
    if not refs:
        return ray.data.from_arrow(schema.empty_table()), unified, errors
    return ray.data.from_arrow_refs(refs), unified, errors
