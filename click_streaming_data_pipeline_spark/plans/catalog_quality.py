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
    docs = load_table(spark, sf_dir, "documents")
    cols = quality_check_columns("text", "n_chars")
    scored = docs.select(
        "doc_id",
        *(
            cols[name].alias(name)
            for name in (
                "completeness",
                "consistency",
                "pii_detection",
                "language_quality",
            )
        ),
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
    docs = load_table(spark, sf_dir, "documents")
    cols = quality_check_columns("text", "n_chars")
    issue_structs = F.array(
        *[
            F.when(
                cols[name] < 50,
                F.struct(
                    F.lit(name).alias("type"),
                    F.when(cols[name] < 25, F.lit("high"))
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
    return docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.substring("text", 1, 64).alias("title"),
        F.octet_length("text").alias("content_size"),
        cols["quality_score"].alias("quality_score"),
        cols["quality_is_valid"].alias("quality_is_valid"),
        F.filter(issue_structs, lambda x: x.isNotNull()).alias(
            "quality_issues"
        ),
        cols["has_pii"].alias("has_pii"),
        F.struct(
            cols["completeness"].alias("completeness"),
            cols["consistency"].alias("consistency"),
            cols["pii_detection"].alias("pii_detection"),
            cols["language_quality"].alias("language_quality"),
        ).alias("quality_checks"),
        F.lit("heuristic").alias("quality_provider"),
        F.lit("rules-v1").alias("quality_model"),
        F.lit("2024-01-01T00:00:00Z").alias("quality_checked_at"),
    )


@query(
    "quality_events_full",
    oracle=None,  # nested payload: schema + values pytest-gated
    doc=(
        "H2/H3 full enriched-event contract (data-quality "
        "main.py:127-161; FIXTURES.md section 5): flattened doc fields "
        "+ nested quality_checks struct + quality_issues array<struct> "
        "+ provider/model metadata — the quality.checks topic payload. "
        "The catalog projection serializes the issues ARRAY to JSON "
        "because the driver harness canonicalizes every output with "
        "pandas, where array cells are unhashable (the r1 "
        "multimodal_features failure mode); the nested form stays in "
        "``quality_events_nested`` under the contract pytest."
    ),
    tags=("quality", "streaming"),
)
def quality_events_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = quality_events_nested(spark, sf_dir)
    return nested.withColumn(
        "quality_issues", F.to_json("quality_issues")
    )
