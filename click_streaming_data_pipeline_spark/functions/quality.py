"""Deterministic document-quality scorer.

Re-expresses the reference's LLM quality UDF (SURVEY.md section 2 H2;
reference ``services/data-quality/app/llm/providers/OpenAIProvider.py:42-176``)
as pure Spark column expressions — no Python UDF in the hot path, so the
whole check runs inside whole-stage codegen and scales linearly.

Output contract mirrors the reference's result schema
(``services/data-quality/app/main.py:127-161``):
four 0-100 sub-scores (completeness, consistency, pii_detection,
language_quality), the weighted overall score
(0.3/0.3/0.2/0.2 per ``OpenAIProvider.py:154-165``), ``is_valid``
(overall >= MIN_QUALITY_SCORE, default 50.0 per
``services/data-quality/app/config.py:22``) and ``has_pii``
(``llm/schemas.py:52-55``).

Every expression here has a byte-identical DuckDB twin in
``quality_oracle_exprs`` so the oracle comparison is exact — both
engines do the same IEEE double arithmetic on the same inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: weights from OpenAIProvider.py:155-160
QUALITY_WEIGHTS = {
    "completeness": 0.3,
    "consistency": 0.3,
    "pii_detection": 0.2,
    "language_quality": 0.2,
}

MIN_QUALITY_SCORE = 50.0

# PII heuristics standing in for the reference's LLM pii_check —
# deliberately RE2-compatible so Spark (Java regex) and DuckDB (RE2)
# agree on every input.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}"

#: stopword list for the language-quality ratio (shared with oracle)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")


def quality_check_columns(
    text_col: str = "text", n_chars_col: str = "n_chars"
) -> dict[str, Column]:
    """Build the quality sub-score / overall / flag columns.

    Returns a dict of named Columns; callers ``select``/``withColumns``
    them. All arithmetic is double-typed and mirrors
    ``quality_oracle_exprs`` exactly.
    """
    text = F.col(text_col)
    n_chars = F.col(n_chars_col)
    tokens = F.split(text, " ")

    completeness = F.least(F.lit(100.0), n_chars / F.lit(20.0))
    consistency = (
        F.when(F.length(text) == n_chars, F.lit(100.0)).otherwise(F.lit(50.0))
    )
    has_pii = text.rlike(EMAIL_RE) | text.rlike(PHONE_RE)
    pii_detection = F.when(has_pii, F.lit(0.0)).otherwise(F.lit(100.0))
    stop_hits = F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))
    stop_ratio = stop_hits / F.greatest(F.size(tokens), F.lit(1))
    language_quality = F.least(F.lit(100.0), stop_ratio * F.lit(250.0))

    overall = (
        completeness * F.lit(QUALITY_WEIGHTS["completeness"])
        + consistency * F.lit(QUALITY_WEIGHTS["consistency"])
        + pii_detection * F.lit(QUALITY_WEIGHTS["pii_detection"])
        + language_quality * F.lit(QUALITY_WEIGHTS["language_quality"])
    )
    return {
        "completeness": completeness,
        "consistency": consistency,
        "pii_detection": pii_detection,
        "language_quality": language_quality,
        "quality_score": overall,
        "quality_is_valid": overall >= F.lit(MIN_QUALITY_SCORE),
        "has_pii": has_pii,
    }


def with_quality_columns(df, text_col: str = "text",
                         n_chars_col: str = "n_chars",
                         names: tuple[str, ...] | None = None):
    """Append quality columns to ``df`` with the expensive per-row
    primitives (tokenizer split, stop-word HOF filter, PII rlikes)
    computed ONCE behind a 1-element explode fence.

    Selecting ``quality_check_columns``' dict entries as independent
    columns lets the optimizer inline one full tokenizer/regex tree
    per column (six split() passes per row in the CDC plan; the
    higher-order stop-word filter gets no codegen CSE). Here the
    primitives land in a fenced struct and every score derives from
    those scalars — byte-identical arithmetic over identical
    integers, so all oracle hashes are unchanged (gated by the CDC
    and quality lanes' value hashes).

    ``names`` restricts the appended columns (default: all seven,
    in ``quality_check_columns`` order).
    """
    text = F.col(text_col)
    n_chars = F.col(n_chars_col)
    tokens = F.split(text, " ")
    prim = F.struct(
        F.length(text).alias("len_text"),
        F.size(tokens).alias("n_tokens"),
        F.size(
            F.filter(tokens, lambda t: t.isin(*STOPWORDS))
        ).alias("stop_hits"),
        (text.rlike(EMAIL_RE) | text.rlike(PHONE_RE)).alias("has_pii"),
    )
    fenced = df.select("*", F.explode(F.array(prim)).alias("__qp"))
    completeness = F.least(F.lit(100.0), n_chars / F.lit(20.0))
    consistency = F.when(
        F.col("__qp.len_text") == n_chars, F.lit(100.0)
    ).otherwise(F.lit(50.0))
    pii_detection = F.when(F.col("__qp.has_pii"), F.lit(0.0)).otherwise(
        F.lit(100.0)
    )
    stop_ratio = F.col("__qp.stop_hits") / F.greatest(
        F.col("__qp.n_tokens"), F.lit(1)
    )
    language_quality = F.least(F.lit(100.0), stop_ratio * F.lit(250.0))
    overall = (
        completeness * F.lit(QUALITY_WEIGHTS["completeness"])
        + consistency * F.lit(QUALITY_WEIGHTS["consistency"])
        + pii_detection * F.lit(QUALITY_WEIGHTS["pii_detection"])
        + language_quality * F.lit(QUALITY_WEIGHTS["language_quality"])
    )
    cols = {
        "completeness": completeness,
        "consistency": consistency,
        "pii_detection": pii_detection,
        "language_quality": language_quality,
        "quality_score": overall,
        "quality_is_valid": overall >= F.lit(MIN_QUALITY_SCORE),
        "has_pii": F.col("__qp.has_pii"),
    }
    keep = names if names is not None else tuple(cols)
    # Re-scoring an already-scored frame must REPLACE the quality
    # columns, not duplicate them (select('*', alias) would emit two
    # columns named quality_score etc. — withColumn semantics here).
    carried = [c for c in fenced.columns if c not in keep]
    return fenced.select(
        *carried, *(cols[n].alias(n) for n in keep)
    ).drop("__qp")


def quality_oracle_exprs(
    text_col: str = "text", n_chars_col: str = "n_chars"
) -> dict[str, str]:
    """DuckDB SQL twins of ``quality_check_columns`` (same math, same
    order of operations, so doubles match bit-for-bit)."""
    # NB: bare 100.0 literals are DECIMAL in DuckDB (double in Spark);
    # cast explicitly so standalone columns and downstream arithmetic
    # are double on both engines.
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    completeness = (
        f"least(CAST(100.0 AS DOUBLE), {n_chars_col} / 20.0)"
    )
    consistency = (
        f"CASE WHEN length({text_col}) = {n_chars_col} "
        "THEN CAST(100.0 AS DOUBLE) ELSE CAST(50.0 AS DOUBLE) END"
    )
    has_pii = (
        f"(regexp_matches({text_col}, '{EMAIL_RE}') OR "
        f"regexp_matches({text_col}, '{PHONE_RE}'))"
    )
    pii = (
        f"CASE WHEN {has_pii} THEN CAST(0.0 AS DOUBLE) "
        "ELSE CAST(100.0 AS DOUBLE) END"
    )
    ratio = (
        f"len(list_filter(string_split({text_col}, ' '), "
        f"t -> t IN ({stops}))) / "
        f"greatest(len(string_split({text_col}, ' ')), 1)"
    )
    language = f"least(CAST(100.0 AS DOUBLE), ({ratio}) * 250.0)"
    overall = (
        f"(({completeness}) * 0.3 + ({consistency}) * 0.3 + "
        f"({pii}) * 0.2 + ({language}) * 0.2)"
    )
    return {
        "completeness": completeness,
        "consistency": consistency,
        "pii_detection": pii,
        "language_quality": language,
        "quality_score": overall,
        "quality_is_valid": f"({overall}) >= 50.0",
        "has_pii": has_pii,
    }
