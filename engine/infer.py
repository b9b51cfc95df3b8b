"""Sample-based CSV format inference (S6/T2, SURVEY 2.1/2.3).

Re-implements, from the published method (van den Burg et al.,
"Wrangling Messy CSV Files by Detecting Row and Type Patterns", 2018 --
the same public source the reference cites), the data-consistency
dialect search used by the reference (``backend/app/services/
dialect_detector.py:41-158``) and its vertical-layout heuristic
(``backend/app/services/csv_handler.py:32-63``), with identical
observable behavior:

- consistency Q = pattern score x type score over the first 8 KiB
- candidates: {',', ';', TAB, '|'} x {'"', "'"} scored with a *strict*
  csv parse (unclosed quotes disqualify a candidate)
- fallback to the standard comma dialect when nothing scores
- vertical layout iff (avg row width of first 20 rows in 4 KiB) <= 2.5
  AND first-column duplication ratio > 0.3

Fit-once, apply-many: inference runs on the driver (or once per file in
a read task) over a bounded sample -- O(1) per file regardless of file
size -- and the winning dialect is broadcast to all parse tasks.
"""

from __future__ import annotations

import csv
import io
import re
from dataclasses import dataclass
from collections import Counter
from typing import List, Optional, Tuple

#: single-column guard (paper's alpha) and type-score floor (beta),
#: matching the reference constants (dialect_detector.py:21-22).
ALPHA = 1e-3
BETA = 1e-10

DIALECT_SAMPLE_BYTES = 8192  # dialect_detector.py:38
LAYOUT_SAMPLE_BYTES = 4096  # csv_handler.py:36
LAYOUT_SAMPLE_ROWS = 20  # csv_handler.py:43

#: type-recognition regexes, most-specific first (dialect_detector.py:26-36)
TYPE_PATTERNS = [
    re.compile(r"^\s*$"),  # empty
    re.compile(r"^-?\d+$"),  # integer
    re.compile(r"^-?\d+[.,]\d+(e[+-]?\d+)?$"),  # float incl. European decimal
    re.compile(r"^(http|https)://[^\s/$.?#].[^\s]*$"),  # url
    re.compile(r"^[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\.[a-zA-Z0-9-.]+$"),  # email
    re.compile(r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}(:\d{2})?)?$"),  # iso datetime
    re.compile(r"^\d{1,2}[/-]\d{1,2}[/-]\d{2,4}$"),  # common date
    re.compile(r"^[Nn]/?[Aa]$"),  # n/a
    re.compile(r"^[A-Za-z0-9\s\-_]+$"),  # alphanumeric
]

CANDIDATE_DELIMITERS = [",", ";", "\t", "|"]
CANDIDATE_QUOTECHARS = ['"', "'"]


@dataclass(frozen=True)
class Dialect:
    """A picked CSV dialect, broadcastable to read tasks."""

    delimiter: str = ","
    quotechar: str = '"'

    def reader(self, text: str):
        return csv.reader(io.StringIO(text), delimiter=self.delimiter, quotechar=self.quotechar)


EXCEL = Dialect(",", '"')


def _parse_strict(sample: str, delimiter: str, quotechar: str) -> List[List[str]]:
    try:
        return list(
            csv.reader(io.StringIO(sample), delimiter=delimiter, quotechar=quotechar, strict=True)
        )
    except csv.Error:
        return []


def pattern_score(rows: List[List[str]]) -> float:
    """P = (1/K) * sum_k N_k * max(alpha, L_k - 1) / L_k over the row-width
    histogram (K distinct widths).

    A zero-width row (blank line mid-sample) raises ZeroDivisionError
    ON PURPOSE: the reference computes numerator/length unguarded
    (dialect_detector.py:135), its per-candidate broad except disquali-
    fies the candidate, and the search falls back to excel. Guarding
    here would silently pick a different dialect than the reference for
    any sample containing a blank line (observable parity break).
    """
    if not rows:
        return 0.0
    counts = Counter(len(r) for r in rows)
    total = sum(n * (max(ALPHA, length - 1) / length) for length, n in counts.items())
    return total / len(counts)


def type_score(rows: List[List[str]]) -> float:
    """T = fraction of cells matching any known type pattern, floored at beta."""
    cells = [c for r in rows for c in r]
    if not cells:
        return BETA
    matched = sum(1 for c in cells if any(p.match(c.strip()) for p in TYPE_PATTERNS))
    return max(BETA, matched / len(cells))


def detect_dialect(content: str, sample_bytes: int = DIALECT_SAMPLE_BYTES) -> Dialect:
    """Maximize Q = P x T over the candidate grid; comma/double-quote
    fallback when no candidate parses (garbage input)."""
    sample = content[:sample_bytes]
    best: Optional[Tuple[str, str]] = None
    best_q = -1.0
    for d in CANDIDATE_DELIMITERS:
        for q in CANDIDATE_QUOTECHARS:
            try:
                rows = _parse_strict(sample, d, q)
                if not rows:
                    continue
                score = pattern_score(rows) * type_score(rows)
            except Exception:
                # reference: broad except disqualifies the candidate
                # (e.g. ZeroDivisionError from a blank line)
                continue
            if score > best_q:
                best_q = score
                best = (d, q)
    if best is None:
        return EXCEL
    return Dialect(*best)


def is_vertical_layout(
    content: str,
    dialect: Dialect,
    sample_bytes: int = LAYOUT_SAMPLE_BYTES,
    sample_rows: int = LAYOUT_SAMPLE_ROWS,
) -> bool:
    """Key-value dump heuristic: narrow rows + repeating first column."""
    reader = dialect.reader(content[:sample_bytes])
    widths: List[int] = []
    first_col: List[str] = []
    try:
        for _ in range(sample_rows):
            row = next(reader)
            if row:
                widths.append(len(row))
                first_col.append(row[0])
    except (StopIteration, csv.Error):
        pass
    if not widths:
        return False
    if sum(widths) / len(widths) > 2.5:
        return False
    duplication = 1 - (len(set(first_col)) / len(first_col))
    return duplication > 0.3
