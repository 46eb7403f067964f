"""Pluggable quality-check providers (SURVEY 2 H2).

Mirrors the reference's provider architecture —
``LLMInterface.py:3-10`` (abstract ``validate``),
``LLMProviderFactory.py:6-23`` (name -> provider), and the OpenAI
implementation's prompt/parse/weights
(``OpenAIProvider.py:19-176``) — with two providers:

- ``HeuristicProvider``: deterministic, vectorized pandas math,
  bit-identical to the pure-expression scorer in
  ``functions.quality`` (equivalence is oracle-gated: the pandas-UDF
  query shares the expression query's DuckDB oracle).
- ``LLMProvider``: the real-LLM slot. The chat-completions call
  (temperature=0, JSON mode, content truncated to 1024 chars,
  ``OpenAIProvider.py:31-44``) is implemented stdlib-only in
  :func:`http_chat_transport` and wired in with ``base_url=``; with
  no transport configured ``score_batch`` raises NotImplementedError
  at the exact call site. The batching — one semaphore-bounded async
  gather per Arrow batch — is exercised end-to-end over real loopback
  HTTP in ``tests/test_quality_providers.py`` (external endpoints are
  unreachable from this sandbox, so that is as real as it gets here).

Why a UDF path at all when expressions exist: the expression scorer
is the fast path (codegen, no Python). The provider path exists for
scorers that *can't* be expressions (remote models); Arrow batching
keeps it ~vectorized. Both emit the same schema so they interchange.
"""

from __future__ import annotations

import asyncio
import json
import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from .quality import EMAIL_RE, PHONE_RE, QUALITY_WEIGHTS, STOPWORDS

CHECKS_SCHEMA = StructType(
    [
        StructField("completeness", DoubleType()),
        StructField("consistency", DoubleType()),
        StructField("pii_detection", DoubleType()),
        StructField("language_quality", DoubleType()),
    ]
)

LLM_INPUT_CAP = 1024  # reference config.py:18


class HeuristicProvider:
    """Deterministic scorer; same math as quality_check_columns."""

    name = "heuristic"
    model = "rules-v1"

    def score_batch(self, text: pd.Series, n_chars: pd.Series) -> pd.DataFrame:
        email = re.compile(EMAIL_RE)
        phone = re.compile(PHONE_RE)
        stops = set(STOPWORDS)
        rows = []
        for t, n in zip(text, n_chars):
            completeness = min(100.0, n / 20.0)
            consistency = 100.0 if len(t) == n else 50.0
            has_pii = bool(email.search(t) or phone.search(t))
            pii = 0.0 if has_pii else 100.0
            toks = t.split(" ")
            # case-sensitive, matching the expression scorer's
            # t.isin(*STOPWORDS) and the shared DuckDB oracle
            ratio = sum(1 for x in toks if x in stops) / max(len(toks), 1)
            language = min(100.0, ratio * 250.0)
            rows.append((completeness, consistency, pii, language))
        return pd.DataFrame(
            rows,
            columns=[
                "completeness",
                "consistency",
                "pii_detection",
                "language_quality",
            ],
        )


_SCORE_KEYS = (
    "completeness",
    "consistency",
    "pii_detection",
    "language_quality",
)
_ZERO_ROW = (0.0, 0.0, 0.0, 0.0)


class LLMProvider:
    """Remote-LLM provider (OpenAIProvider.py shape): one async-gather
    of chat-completions per Arrow batch, bounded by a concurrency
    semaphore; each response is JSON-parsed into the 4 scores and any
    per-prompt failure (transport error, bad JSON, missing/ill-typed
    keys) degrades to a zero-score row instead of failing the batch
    (OpenAIProvider.py:178-202's error contract).

    The network call itself is injected as ``transport``: an async
    callable ``(prompt, model) -> str`` returning the model's JSON
    text. Passing ``base_url=`` instead builds the real HTTP
    chat-completions transport (:func:`http_chat_transport` —
    temperature=0 + JSON mode, OpenAIProvider.py:31-44); a base_url is
    a picklable string, so it survives the trip into Arrow-UDF worker
    processes where a closure transport would not. With neither, the
    default raises NotImplementedError at the exact call site. The
    full Spark -> Arrow batch -> async gather -> HTTP POST -> parse ->
    clamp path is executed end-to-end in tests against an in-process
    loopback server (no external network)."""

    name = "llm"
    model = "gpt-4o-mini"  # reference default, config.py:16
    max_concurrency = 8  # in-flight requests per Arrow batch

    def __init__(self, transport=None, base_url=None, api_key=None):
        if transport is None and base_url is not None:
            transport = http_chat_transport(base_url, api_key=api_key)
        self._transport = transport

    @staticmethod
    def build_prompt(text: str) -> str:
        """Truncated (G7, config.py:18) scoring prompt asking for the
        4-key JSON object — the reference's prompt contract
        (OpenAIProvider.py:19-30)."""
        return (
            "Score the following content 0-100 on completeness, "
            "consistency, pii_detection and language_quality; reply "
            "with exactly one JSON object with those four keys.\n\n"
            + text[:LLM_INPUT_CAP]
        )

    async def _score_one(self, sem, prompt: str):
        async with sem:
            try:
                raw = await self._transport(prompt, model=self.model)
                parsed = json.loads(raw)
                return tuple(
                    min(100.0, max(0.0, float(parsed[k])))
                    for k in _SCORE_KEYS
                )
            except Exception:
                return _ZERO_ROW

    async def _score_all(self, prompts: list[str]):
        sem = asyncio.Semaphore(self.max_concurrency)
        return await asyncio.gather(
            *[self._score_one(sem, p) for p in prompts]
        )

    def score_batch(self, text: pd.Series, n_chars: pd.Series) -> pd.DataFrame:
        prompts = [self.build_prompt(t) for t in text]
        if self._transport is None:
            raise NotImplementedError(
                f"LLM scoring for {len(prompts)} prompts requires network "
                "access; unavailable in this environment"
            )
        rows = asyncio.run(self._score_all(prompts))
        return pd.DataFrame(rows, columns=list(_SCORE_KEYS))


def http_chat_transport(base_url: str, *, api_key: str | None = None,
                        timeout: float = 30.0):
    """Real chat-completions HTTP transport (OpenAIProvider.py:31-44's
    request contract): POST {model, messages, temperature=0, JSON
    response_format} to ``{base_url}/chat/completions`` and return the
    first choice's message content. stdlib-only (urllib inside
    ``asyncio.to_thread``) so it runs in this environment and inside
    Arrow-UDF workers; concurrency is already bounded by the
    provider's semaphore, so one thread per in-flight request is the
    intended shape, not an accident."""
    import urllib.request

    endpoint = base_url.rstrip("/") + "/chat/completions"
    headers = {"Content-Type": "application/json"}
    if api_key:
        headers["Authorization"] = f"Bearer {api_key}"

    async def call(prompt: str, *, model: str) -> str:
        def post() -> str:
            body = json.dumps(
                {
                    "model": model,
                    "messages": [{"role": "user", "content": prompt}],
                    "temperature": 0,
                    "response_format": {"type": "json_object"},
                }
            ).encode()
            req = urllib.request.Request(
                endpoint, data=body, method="POST", headers=headers
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                payload = json.loads(resp.read().decode())
            return payload["choices"][0]["message"]["content"]

        return await asyncio.to_thread(post)

    return call


_PROVIDERS = {
    HeuristicProvider.name: HeuristicProvider,
    LLMProvider.name: LLMProvider,
}


def get_provider(name: str = "heuristic", **kwargs):
    """Factory (LLMProviderFactory.py:6-23): unknown name -> error.
    ``kwargs`` pass through to the provider constructor (e.g.
    ``transport=`` for LLMProvider)."""
    try:
        cls = _PROVIDERS[name]
    except KeyError:
        raise ValueError(
            f"unknown quality provider {name!r}; have {sorted(_PROVIDERS)}"
        ) from None
    return cls(**kwargs)


def quality_checks_udf(provider_name: str = "heuristic", **provider_kwargs):
    """Arrow-batched pandas UDF emitting the 4-score struct.
    ``provider_kwargs`` (e.g. ``base_url=``) must be picklable — they
    cross into the UDF worker and the provider is constructed there."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(CHECKS_SCHEMA)
    def _udf(text: pd.Series, n_chars: pd.Series) -> pd.DataFrame:
        return get_provider(provider_name, **provider_kwargs).score_batch(
            text, n_chars
        )

    return _udf


def with_provider_quality(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_chars_col: str = "n_chars",
    provider_name: str = "heuristic",
    **provider_kwargs,
) -> DataFrame:
    """Attach provider-based quality columns (same names/semantics as
    the expression scorer): 4 sub-scores + weighted overall +
    validity. The weighted combine stays JVM-side so only the scores
    cross the Arrow boundary."""
    udf = quality_checks_udf(provider_name, **provider_kwargs)
    out = df.withColumn(
        "__q", udf(F.col(text_col), F.col(n_chars_col).cast("long"))
    )
    w = QUALITY_WEIGHTS
    overall = (
        F.col("__q.completeness") * w["completeness"]
        + F.col("__q.consistency") * w["consistency"]
        + F.col("__q.pii_detection") * w["pii_detection"]
        + F.col("__q.language_quality") * w["language_quality"]
    )
    return (
        out.withColumn("completeness", F.col("__q.completeness"))
        .withColumn("consistency", F.col("__q.consistency"))
        .withColumn("pii_detection", F.col("__q.pii_detection"))
        .withColumn("language_quality", F.col("__q.language_quality"))
        .withColumn("quality_score", overall)
        .withColumn("quality_is_valid", overall >= 50.0)
        .withColumn("has_pii", F.col("__q.pii_detection") == 0.0)
        .drop("__q")
    )


assert math.isclose(sum(QUALITY_WEIGHTS.values()), 1.0)
