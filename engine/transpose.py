"""Vertical key-value transposer (T1) -- the engine's only
order-sensitive operator.

Semantics from the reference (``backend/app/services/transposer.py:
17-66``), re-stated as a session-window state machine over an ordered
record stream:

- a row contributes ``(key=row[0].strip(), value=sanitize(row[1] or ''))``
- blank rows and empty keys are skipped (``:33-39``)
- window boundary: seeing the *anchor key* (first field ever seen) again
  while it is already present in the open window starts a new record
  (``:44-46``)
- schema grows by appending unseen keys (``:48-49``)
- the open window flushes at end-of-input (``:53-54``)
- any csv.Error aborts to ``([], [])`` (``:62-66``)

Partitioning assumption (SURVEY 2.9): file order IS record order, so one
source file must be parsed by exactly one task, never re-split across
block boundaries. The Ray front-end therefore maps whole files
(``read_binary_files``) through an actor pool, one file per batch
element -- see :mod:`engine.csv_ingest`.
"""

from __future__ import annotations

import csv
from typing import Dict, List, Tuple

from engine.infer import Dialect
from engine.sanitize import sanitize_cell


def transpose_vertical(content: str, dialect: Dialect) -> Tuple[List[Dict], List[str]]:
    """Parse a vertical KV dump into (records, ordered fields)."""
    fields: List[str] = []
    records: List[Dict] = []
    window: Dict[str, str] = {}
    try:
        for row in dialect.reader(content):
            if not row:
                continue
            key = row[0].strip() if row[0] else ""
            if not key:
                continue
            value = sanitize_cell(row[1] if len(row) > 1 else "")
            if fields and key == fields[0] and key in window:
                records.append(window)
                window = {}
            if key not in fields:
                fields.append(key)
            window[key] = value
        if window:
            records.append(window)
        return records, fields
    except csv.Error:
        return [], []
