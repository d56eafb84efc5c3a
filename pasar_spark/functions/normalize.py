"""Arrow-vectorized per-turn text normalization.

The north rule requires ALL per-turn text normalization to run as
vectorized pandas/Arrow UDF batches — never per-row Python. This is the
engine's replacement for the reference's per-row normalization chains
(UPPER/LOWER/regexp_replace/suffix-strip in
etl/pypasar/db/sql/postgres/drug_exposure/temp_drugmed_view.sql:10-77 and
the pandas ``.apply(axis=1)`` calls at etl/pypasar/omop/measurement.py:294,
439,467 — the latter being exactly the row-at-a-time anti-pattern).

Canonical form (must stay in lockstep with ``NORMALIZE_SQL`` below, which
is the ANSI-SQL oracle used by the DuckDB correctness gate):
  1. unicode NFC normalization
  2. strip leading/trailing whitespace
  3. collapse internal whitespace runs (space/tab/newline) to one space

Placement: the engine normalizes AFTER the LWW reduce — only winning rows
pay the Python->Arrow hop, which at 10^10 events with a 40% update ratio
cuts the UDF volume by the full update/duplicate factor.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# DuckDB/ANSI equivalent of normalize_text, for oracle parity checks.
NORMALIZE_SQL = "nfc_normalize(trim(regexp_replace({col}, '\\s+', ' ', 'g')))"


@pandas_udf(StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    # Vectorized pandas string ops over Arrow batches (zero-copy transfer).
    # Explicit ASCII whitespace class: Python's \s is Unicode-aware while
    # Java's (normalize_text_native) and DuckDB's RE2 \s are ASCII-only —
    # using \s here would silently collapse U+00A0 etc. and break the
    # lockstep contract with NORMALIZE_SQL below.
    out = s.str.replace(r"[ \t\n\r\f\v]+", " ", regex=True).str.strip(" \t\n\r\f\v")
    # NFC is the identity on ASCII, so detect non-ASCII rows with a
    # vectorized regex and normalize ONLY those — for a mostly-ASCII
    # corpus the per-item Python normalize call disappears entirely.
    nonascii = out.str.contains(r"[^\x00-\x7F]", regex=True, na=False)
    if nonascii.any():
        out = out.copy()
        out.loc[nonascii] = out.loc[nonascii].map(
            lambda x: unicodedata.normalize("NFC", x)
        )
    return out


def normalize_text_native(col: Column) -> Column:
    """Catalyst-native normalization (no Python at all) — identical output
    for ASCII-only corpora (NFC is a no-op on ASCII). The replay pipeline
    uses this fast path when the feed declares an ASCII text domain; the
    pandas_udf path is the general-unicode path."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))
