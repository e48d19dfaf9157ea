"""Text-analysis functions for LLM data pipelines (north-star additions,
SURVEY.md §2.2 last row): tokenization, quality metrics, language ID,
fingerprinting. All are JVM-side expressions (split / regexp / md5 /
higher-order array functions) — no Python in the hot path, so they run
at scan speed on a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language stopword profiles for the n-gram/stopword language
# heuristic. Deliberately tiny and public-knowledge; the point is the
# *mechanism* (profile scoring entirely in expressions).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "das", "und", "von", "zu", "den", "mit"),
    "zh": ("de", "shi", "le", "zai", "you", "wo", "ta", "men"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.split(F.col(text) if isinstance(text, str) else text, r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-style pre-tokenization count: runs of letters, runs of digits,
    or single non-alphanumeric glyphs — the standard GPT-2-ish pre-token
    regex reduced to its portable core."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def quality_metrics(text: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword quality signals, each a single
    codegen'd expression. Returned as a dict so callers select what they
    need (column pruning keeps unused ones out of the plan)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_PROFILES["en"]))
    )
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()]", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "avg_token_len": (n_chars - (n_tok - 1)) / n_tok,
        "stopword_ratio": stop_hits / n_tok,
        "punct_ratio": punct / n_chars,
        "digit_ratio": digits / n_chars,
    }


def quality_score(text: Column | str) -> Column:
    """Scalar quality score in [0,1]: rewards natural token length and
    stopword presence, penalizes punctuation/digit noise. Weights are
    heuristic; the operator is the deliverable."""
    m = quality_metrics(text)
    length_term = F.least(m["n_tokens"] / F.lit(64.0), F.lit(1.0))
    stop_term = F.least(m["stopword_ratio"] * 4, F.lit(1.0))
    noise_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - m["punct_ratio"] * 4 - m["digit_ratio"] * 2
    )
    return (length_term * 0.3 + stop_term * 0.4 + noise_term * 0.3).alias(
        "quality_score"
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-profile hit ratio."""
    toks = tokens(text)
    n = F.size(toks)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))) / n
        for lang, words in LANG_PROFILES.items()
    }


def lang_id(text: Column | str) -> Column:
    """argmax over language profiles, ties broken by language code order
    (deterministic). Pure expressions: builds an array of (score, lang)
    structs and takes array_max."""
    scores = lang_scores(text)
    # array_max compares structs field-by-field: score first, then rank;
    # rank = -index so equal scores resolve to the earliest lang code.
    ranked = F.array(
        *[
            F.struct(
                score.alias("score"),
                F.lit(-i).alias("rank"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, score) in enumerate(sorted(scores.items()))
        ]
    )
    return F.array_max(ranked).getField("lang")


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, whitespace collapsed) — the exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


def rolling_fingerprint(text: Column | str, *, window: int = 8) -> Column:
    """Winnowing-style robust fingerprint: min md5 over word k-grams.
    Unlike :func:`fingerprint` it survives local edits outside the
    minimal shingle. Expressed with transform over a sequence — no UDF."""
    toks = tokens(text)
    n = F.size(toks)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, window))),
    )
    return F.array_min(shingles)
