"""Text-analysis operators for training-data pipelines
(beyond-reference extension): token counting, language-ID heuristic,
document fingerprinting. Quality scoring lives in
``functions.quality`` (it doubles as the reference's H2 scorer).

All pure column expressions — the full text-analysis pass over 100 TB
is one codegen'd scan, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish pre-tokenizer: letter runs, digit runs, single other glyphs
#: (whitespace dropped) — the usual GPT-2-style pre-split shape.
BPE_SPLIT_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

#: tiny per-language function-word profiles for the n-gram/stopword
#: language-ID heuristic. Ordered dict: ties break by listing order.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "los"),
    "de": ("der", "die", "das", "und", "zu", "den", "ist"),
    "fr": ("le", "la", "de", "et", "les", "des", "est"),
    "zh": ("的", "是", "了", "在", "和", "有", "我"),
}


def whitespace_token_count(col: Column | str) -> Column:
    return F.size(F.split(col, " "))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token count under the BPE-style regex pre-split — the cheap
    estimator for LLM token budgets."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_SPLIT_RE), 0))


def lang_hits(col: Column | str, lang: str) -> Column:
    """How many tokens hit the language's function-word profile."""
    toks = F.split(F.lower(col), " ")
    words = LANG_PROFILES[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def predicted_lang(col: Column | str) -> Column:
    """argmax over profile hit counts; first-listed language wins ties
    (deterministic). 'und' when nothing hits."""
    langs = list(LANG_PROFILES)
    hits = {lang: lang_hits(col, lang) for lang in langs}
    best = F.greatest(*[hits[lang] for lang in langs])
    expr = F.lit("und")
    # reverse order so earlier-listed languages win equal scores
    for lang in reversed(langs):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(
            expr
        )
    return expr


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token multiset — robust to token reordering, the classic
    near-dup canonicalization (cheaper than shingles, coarser)."""
    return F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.lower(col), " "))), " "
        )
    )
