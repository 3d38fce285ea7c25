"""Text analysis operators for training-data pipelines.

All four are pure Column-expression builders (JVM-side, codegen'd, no
Python in the data plane) so they hold up at 100 TB scans: language ID
(stopword-marker heuristic), quality scoring (length/punct/stopword/
digit ratios), token counting (whitespace + BPE-ish subword estimate),
and document fingerprinting.

Each has an exact ANSI-SQL twin in ``__spark_entry__.oracle_sql`` so the
driver's DuckDB gate checks values, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stopwords per language — tiny on purpose (the heuristic is the
# operator; swap in real lexicons in production)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "pt": ("de", "que", "nao", "uma", "para", "com", "os", "da", "do", "em"),
    "en": ("the", "of", "and", "to", "in", "is", "that", "it", "for", "was"),
    "es": ("el", "la", "los", "las", "una", "por", "como", "pero", "mas", "del"),
}
LANG_PRIORITY = ("en", "pt", "es")  # deterministic tie-break order


def tokens_col(text: Column) -> Column:
    """Non-empty whitespace tokens of lowercased text."""
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != F.lit("")
    )


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def subword_count_col(text: Column) -> Column:
    """BPE-ish token estimate without a tokenizer model: count regex
    word-pieces (letter runs, digit runs, punctuation singles), the
    standard pre-tokenization granularity."""
    letters = F.length(F.regexp_replace(F.lower(text), r"[^a-z]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(F.lower(text), r"[a-z0-9\s]", ""))
    # letter runs ~ letters / 4 (avg piece), digit runs ~ digits / 3
    return (
        F.ceil(letters / F.lit(4.0)) + F.ceil(digits / F.lit(3.0)) + punct
    ).cast("long")


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id_col(text: Column) -> Column:
    """argmax of marker-stopword hit counts; 'und' when all zero.
    Ties resolve in LANG_PRIORITY order (deterministic)."""
    toks = tokens_col(text)
    hits = {lang: _marker_hits(toks, m) for lang, m in LANG_MARKERS.items()}
    best = None
    for lang in LANG_PRIORITY:
        best = hits[lang] if best is None else F.greatest(best, hits[lang])
    out = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        out = F.when((hits[lang] > 0) & (hits[lang] == best), lang).otherwise(out)
    return out


def quality_score_col(text: Column) -> Column:
    """[0,1] quality heuristic: length band + low punct/digit density +
    presence of known stopwords. Deterministic arithmetic only."""
    n_chars = F.length(text)
    toks = tokens_col(text)
    n_toks = F.size(toks)
    punct = F.length(F.regexp_replace(F.lower(text), r"[a-z0-9\s]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    stop_hits = None
    for m in LANG_MARKERS.values():
        h = _marker_hits(toks, m)
        stop_hits = h if stop_hits is None else stop_hits + h

    len_score = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    punct_penalty = F.least(punct / F.greatest(n_chars, F.lit(1)) * 5.0, F.lit(1.0))
    digit_penalty = F.least(digits / F.greatest(n_chars, F.lit(1)) * 5.0, F.lit(1.0))
    stop_score = F.least(stop_hits / F.greatest(n_toks, F.lit(1)) * 4.0, F.lit(1.0))
    return F.round(
        (len_score + stop_score + (1 - punct_penalty) + (1 - digit_penalty)) / 4.0, 6
    )


def fingerprint_col(text: Column, bits: int = 64) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-
    normalized lowercased text, truncated to ``bits``/4 hex chars.
    (The dedup pipeline's winnowed rolling-hash anchors are the
    large-scale fingerprint; this is the cheap exact-dup key.)"""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.substring(F.md5(norm), 1, bits // 4)


def text_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile: id columns + token/subword counts, lang,
    quality, fingerprint."""
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count_col(t).alias("n_tokens"),
        subword_count_col(t).alias("n_subwords"),
        lang_id_col(t).alias("lang_guess"),
        quality_score_col(t).alias("quality"),
        fingerprint_col(t).alias("fingerprint"),
    )
