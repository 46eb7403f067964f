"""Scalar function library (SURVEY.md section 2 G).

Each helper maps one reference scalar behavior onto built-in Spark
expressions (JVM-side, codegen-friendly — no Python UDFs):

- G1 UUIDv7: reference generates time-ordered ids
  (``services/document/app/main.py:68``, ``models.py:26``). Spark's
  ``uuid()`` is v4 and non-deterministic; for oracle-testable output we
  provide a *deterministic* v7-shaped id derived from (timestamp,
  entropy column) — same layout: 48-bit ms timestamp, version nibble 7,
  variant bits, md5-derived tail.
- G2 UTF-8 byte length (``main.py:69,76``): ``octet_length``.
- G7 content truncation to 1024 chars
  (``OpenAIProvider.py:44``, ``config.py:18``): ``substring``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LLM_INPUT_CAP = 1024  # reference config.py:18


def utf8_bytes(col: Column | str) -> Column:
    """UTF-8 byte length (reference content_size semantics, G2)."""
    return F.octet_length(col)


def truncate_content(col: Column | str, cap: int = LLM_INPUT_CAP) -> Column:
    """Bound per-record downstream cost like the reference's LLM input
    truncation (G7)."""
    return F.substring(col, 1, cap)


def uuid7_deterministic(ts_col: Column, entropy_col: Column) -> Column:
    """Deterministic UUIDv7-shaped id (G1).

    Layout: ``tttttttt-tttt-7xxx-yxxx-xxxxxxxxxxxx`` where ``t`` is the
    48-bit unix-millis hex of ``ts_col`` and ``x`` digits come from
    ``md5(entropy)``; the variant nibble is forced to ``8``.
    Lexicographic order == time order, matching the reference's uuid7
    sortability guarantee (SURVEY.md section 1.3).
    """
    millis_hex = F.lpad(
        F.lower(F.hex(F.unix_millis(ts_col))), 12, "0"
    )
    h = F.md5(entropy_col.cast("string"))
    return F.concat_ws(
        "-",
        F.substring(millis_hex, 1, 8),
        F.substring(millis_hex, 9, 4),
        F.concat(F.lit("7"), F.substring(h, 1, 3)),
        F.concat(F.lit("8"), F.substring(h, 4, 3)),
        F.substring(h, 7, 12),
    )
