"""PII / pattern redaction for training-data pipelines.

One pattern table drives BOTH sides: the engine applies the patterns
with Arrow's ``replace_substring_regex`` (RE2) and the DuckDB oracle
applies the *same literal strings* with ``regexp_replace(..., 'g')``
(also RE2) -- the two engines share the regex dialect, so oracle/engine
drift is impossible by construction (same no-drift discipline as
``engine.infer.TYPE_PATTERNS``).

Reference analog: the cell sanitizer family (M1) -- a scalar text
normalization applied per cell; redaction is the training-data-scale
member of that family (strip emails/URLs/IPs/phones before a corpus
ships). Applied vectorized per batch, zero per-row Python.

Order matters and is part of the contract: emails first (so the
user@host text is gone before the phone pattern can eat its digits),
then URLs (which may contain IPs), then bare IPs, then phone-like digit
runs. Both sides apply the same order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from engine.textstats import PY_WS_RE2

#: Python-``\s`` as an explicit RE2 class -- imported from the ONE
#: canonical definition (engine.textstats.PY_WS_RE2); re-exported under
#: the local name existing consumers use.
RE2_WS = PY_WS_RE2

#: (name, RE2 pattern, replacement) applied in ORDER.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+",
        "<EMAIL>",
    ),
    # a URL runs to the next Python-whitespace char (the engine's
    # token boundary), not RE2-\s
    ("url", rf"https?://[^{RE2_WS}]+", "<URL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\. ]{6,}[0-9]", "<PHONE>"),
)


def redact_array(arr, patterns=PII_PATTERNS) -> pa.Array:
    """Redact one Arrow string array (NULL -> '' like every engine text
    kernel; one vectorized RE2 pass per pattern)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = pc.fill_null(arr, "")
    for _name, pat, repl in patterns:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
    return out


def redact_text(ds, text_col: str = "text", out_col: str = "redacted"):
    """Dataset stage: append ``out_col`` with the redacted text.
    Streaming map_batches, zero-copy Arrow in/out."""

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, redact_array(t.column(text_col)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def oracle_expr(col_expr: str, patterns=PII_PATTERNS) -> str:
    """The DuckDB mirror: nested ``regexp_replace(..., 'g')`` over the
    SAME pattern strings in the SAME order."""
    expr = f"coalesce({col_expr}, '')"
    for _name, pat, repl in patterns:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr
