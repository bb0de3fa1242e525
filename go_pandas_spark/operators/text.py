"""Text-analysis operators for training-data pipelines.

Extensions beyond the reference surface (SURVEY §7 phase 12):
language ID (stopword-hit heuristic), quality scoring (length /
punctuation / stopword / word-shape ratios), token counting
(whitespace + BPE-ish regex), and document fingerprinting. Every
operator is a pure JVM expression — no Python in the hot path — so
they run at parquet-scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .dedup import normalize_text

# Minimal stopword lists for the n-gram language heuristic. Small on
# purpose: they are broadcast as literal arrays inside the plan.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "are", "this", "not"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "auf", "sich", "dem", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "dans", "que", "pour", "qui", "sur", "avec"],
    "es": ["el", "la", "los", "las", "y", "es", "no", "una", "con", "por", "para", "del", "como", "pero"],
}


def tokens(c: Column) -> Column:
    return F.split(normalize_text(c), " ")


def token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(c))


_BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_estimate(c: Column) -> Column:
    """BPE-ish token estimate: words + single digits + punctuation
    marks, each word contributing ceil(len/4) subword units (a common
    ~4-chars-per-token heuristic)."""
    pieces = F.regexp_extract_all(c, F.lit(_BPE_RE), F.lit(0))
    units = F.transform(pieces, lambda p: F.ceil(F.length(p) / 4.0).cast("long"))
    return F.coalesce(F.aggregate(units, F.lit(0).cast("long"), lambda acc, x: acc + x), F.lit(0).cast("long"))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    toks = tokens(c)
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
    # array_intersect dedups; count actual hit tokens for a true ratio
    hit_tokens = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lang])))
    return hit_tokens / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(c: Column) -> Column:
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def upper_ratio(c: Column) -> Column:
    n_upper = F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    n_alpha = F.length(c) - F.length(F.regexp_replace(c, r"[A-Za-z]", ""))
    return n_upper / F.greatest(n_alpha, F.lit(1))


def mean_word_len(c: Column) -> Column:
    toks = tokens(c)
    total = F.aggregate(F.transform(toks, lambda t: F.length(t).cast("long")),
                        F.lit(0).cast("long"), lambda a, x: a + x)
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality score: rewards stopword presence and
    sane word shapes, penalizes punctuation soup and shouting.
    Deterministic expression — auditable, reproducible, cheap."""
    sw = stopword_ratio(c)
    pr = punct_ratio(c)
    ur = upper_ratio(c)
    mwl = mean_word_len(c)
    length_ok = F.when((F.length(c) >= 50) & (F.length(c) <= 100_000), 1.0).otherwise(0.5)
    sw_term = F.least(sw * F.lit(4.0), F.lit(1.0))          # ~25% stopwords = perfect
    punct_term = F.greatest(F.lit(1.0) - pr * 4.0, F.lit(0.0))
    caps_term = F.greatest(F.lit(1.0) - ur * 2.0, F.lit(0.0))
    shape_term = F.when((mwl >= 3) & (mwl <= 10), 1.0).otherwise(0.5)
    return F.round((sw_term * 0.4 + punct_term * 0.2 + caps_term * 0.2 + shape_term * 0.2) * length_ok, 6)


def detect_language(c: Column) -> Column:
    """Stopword-hit language ID across the STOPWORDS table; returns the
    argmax language code or 'unknown' when nothing matches."""
    toks = tokens(c)

    def _hit(words):
        ws = list(words)
        return lambda t: t.isin(ws)  # arity-1: F.filter passes (x, i) to arity-2 lambdas

    scores = [(lang, F.size(F.filter(toks, _hit(words)))) for lang, words in STOPWORDS.items()]
    best_score = F.greatest(*[s for _, s in scores])
    expr = F.lit("unknown")
    for lang, s in reversed(scores):  # earlier langs win ties
        expr = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(c: Column) -> Column:
    """Content fingerprint: md5 of the normalized text. The reference
    analog is SipHash row hashing (``pandas/_libs/hashing.pyx``); md5
    here because it is reproducible across engines (oracle-checkable)."""
    return F.md5(normalize_text(c))


def text_stats(sdf, text_col: str):
    """One-pass projection of the full stats battery."""
    c = F.col(text_col)
    return sdf.withColumns({
        "n_chars_calc": F.length(c),
        "n_tokens": token_count(c),
        "n_bpe_tokens": bpe_token_estimate(c),
        "punct_ratio": F.round(punct_ratio(c), 6),
        "upper_ratio": F.round(upper_ratio(c), 6),
        "mean_word_len": F.round(mean_word_len(c), 6),
        "stopword_ratio_en": F.round(stopword_ratio(c), 6),
        "quality": quality_score(c),
        "lang_detected": detect_language(c),
        "fingerprint": fingerprint(c),
    })
