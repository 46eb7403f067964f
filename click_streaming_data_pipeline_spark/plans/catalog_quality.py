"""Quality-pipeline catalog, part 2: the pluggable provider path
(pandas-UDF scorer sharing the expression scorer's oracle) and the
reference's full enriched-event output contract, issues array
included (SURVEY 2 H2/H3, G9; FIXTURES.md section 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.providers import with_provider_quality
from ..functions.quality import quality_check_columns, quality_oracle_exprs
from ..sources import load_table
from ..sources.tables import scan_parallel
from .registry import query

_Q = quality_oracle_exprs("text", "n_chars")
_QUALITY_COLS_SQL = ",\n".join(
    f"       ({expr}) AS {name}" for name, expr in _Q.items()
)


@query(
    "quality_scores_udf",
    # SAME oracle as the expression-scorer query: the Arrow-batched
    # provider path must be bit-identical to the codegen path
    oracle=f"""
        SELECT doc_id,
{_QUALITY_COLS_SQL}
        FROM documents
    """,
    doc=(
        "H2 via the pluggable provider architecture "
        "(LLMInterface.py:3-10, LLMProviderFactory.py:6-23): "
        "Arrow-batched pandas-UDF scorer (the slot a remote LLM "
        "provider occupies), hash-gated equal to the expression scorer"
    ),
    tags=("quality",),
)
def quality_scores_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parallel(load_table(spark, sf_dir, "documents"))
    return with_provider_quality(docs, provider_name="heuristic").select(
        "doc_id",
        "completeness",
        "consistency",
        "pii_detection",
        "language_quality",
        "quality_score",
        "quality_is_valid",
        "has_pii",
    )


_ISSUE_CHECKS = [
    ("completeness", _Q["completeness"]),
    ("consistency", _Q["consistency"]),
    ("pii_detection", _Q["pii_detection"]),
    ("language_quality", _Q["language_quality"]),
]

_ISSUES_ORACLE = " UNION ALL ".join(
    f"""SELECT doc_id, '{name}' AS issue_type, ({expr}) AS s
        FROM documents"""
    for name, expr in _ISSUE_CHECKS
)


@query(
    "quality_issues_flat",
    oracle=f"""
        SELECT doc_id, issue_type,
               CASE WHEN s < 25 THEN 'high' ELSE 'medium' END AS severity,
               'content' AS field
        FROM ({_ISSUES_ORACLE})
        WHERE s < 50
    """,
    doc=(
        "H2/G9 quality issues: one issue struct per failing sub-check "
        "(type/severity/field, llm/schemas.py:42-50 all_issues concat; "
        "severity from score band), flattened for the oracle gate"
    ),
    tags=("quality",),
)
def quality_issues_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.quality import with_quality_columns

    docs = load_table(spark, sf_dir, "documents")
    scored = with_quality_columns(
        docs,
        names=(
            "completeness",
            "consistency",
            "pii_detection",
            "language_quality",
        ),
    ).select(
        "doc_id",
        "completeness",
        "consistency",
        "pii_detection",
        "language_quality",
    )
    issue_structs = F.array(
        *[
            F.when(
                F.col(name) < 50,
                F.struct(
                    F.lit(name).alias("issue_type"),
                    F.when(F.col(name) < 25, F.lit("high"))
                    .otherwise(F.lit("medium"))
                    .alias("severity"),
                ),
            )
            for name, _ in _ISSUE_CHECKS
        ]
    )
    return (
        scored.select(
            "doc_id",
            F.explode(
                F.filter(issue_structs, lambda x: x.isNotNull())
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i.issue_type").alias("issue_type"),
            F.col("i.severity").alias("severity"),
            F.lit("content").alias("field"),
        )
    )


def quality_events_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.quality import with_quality_columns

    docs = load_table(spark, sf_dir, "documents")
    # fenced scoring first: every reference below is a plain column
    # read, so the tokenizer/regex primitives evaluate once per row
    # (cols[name] expressions would re-inline one tree per reference)
    scored = with_quality_columns(docs)
    issue_structs = F.array(
        *[
            F.when(
                F.col(name) < 50,
                F.struct(
                    F.lit(name).alias("type"),
                    F.when(F.col(name) < 25, F.lit("high"))
                    .otherwise(F.lit("medium"))
                    .alias("severity"),
                    F.lit(f"low {name} score").alias("description"),
                    F.lit("content").alias("field"),
                ),
            )
            for name in (
                "completeness",
                "consistency",
                "pii_detection",
                "language_quality",
            )
        ]
    )
    return scored.select(
        F.col("doc_id").cast("string").alias("id"),
        F.substring("text", 1, 64).alias("title"),
        F.octet_length("text").alias("content_size"),
        "quality_score",
        "quality_is_valid",
        F.filter(issue_structs, lambda x: x.isNotNull()).alias(
            "quality_issues"
        ),
        "has_pii",
        F.struct(
            "completeness",
            "consistency",
            "pii_detection",
            "language_quality",
        ).alias("quality_checks"),
        F.lit("heuristic").alias("quality_provider"),
        F.lit("rules-v1").alias("quality_model"),
        F.lit("2024-01-01T00:00:00Z").alias("quality_checked_at"),
    )


_ISSUE_JSON_ELS = ",\n              ".join(
    f"""CASE WHEN ({_Q[name]}) < 50 THEN
                   '{{"type":"{name}","severity":"' ||
                   CASE WHEN ({_Q[name]}) < 25
                        THEN 'high' ELSE 'medium' END ||
                   '","description":"low {name} score","field":"content"}}'
              END"""
    for name in (
        "completeness",
        "consistency",
        "pii_detection",
        "language_quality",
    )
)


@query(
    "quality_events_full",
    # full value oracle: the issues array serializes to a JSON string
    # whose every byte is deterministic (fixed literal strings + a
    # score-banded severity), so DuckDB rebuilds it by concatenation;
    # the quality_checks struct flattens to four double columns (JSON
    # double FORMATTING is the one non-portable piece, so doubles are
    # compared as doubles, not as strings)
    oracle=f"""
        SELECT CAST(doc_id AS VARCHAR) AS id,
               substr(text, 1, 64) AS title,
               CAST(octet_length(encode(text)) AS INT) AS content_size,
{_QUALITY_COLS_SQL},
               '[' || concat_ws(',',
              {_ISSUE_JSON_ELS}) || ']' AS quality_issues,
               'heuristic' AS quality_provider,
               'rules-v1' AS quality_model,
               '2024-01-01T00:00:00Z' AS quality_checked_at
        FROM documents
    """,
    doc=(
        "H2/H3 full enriched-event contract (data-quality "
        "main.py:127-161; FIXTURES.md section 5): flattened doc fields "
        "+ quality sub-scores + quality_issues array<struct> "
        "serialized to JSON + provider/model metadata — the "
        "quality.checks topic payload. FULL value oracle: every byte "
        "of the issues JSON is deterministic (literal strings, "
        "score-banded severity), so DuckDB reconstructs Spark's "
        "to_json output by concatenation; sub-scores are flat double "
        "columns because cross-engine JSON *double formatting* is the "
        "one non-portable piece of the payload. The nested "
        "struct/array form stays in ``quality_events_nested`` under "
        "the contract pytest."
    ),
    tags=("quality", "streaming"),
)
def quality_events_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = quality_events_nested(spark, sf_dir)
    return nested.select(
        "id",
        "title",
        "content_size",
        F.col("quality_checks.completeness").alias("completeness"),
        F.col("quality_checks.consistency").alias("consistency"),
        F.col("quality_checks.pii_detection").alias("pii_detection"),
        F.col("quality_checks.language_quality").alias("language_quality"),
        "quality_score",
        "quality_is_valid",
        "has_pii",
        F.to_json("quality_issues").alias("quality_issues"),
        "quality_provider",
        "quality_model",
        "quality_checked_at",
    )
