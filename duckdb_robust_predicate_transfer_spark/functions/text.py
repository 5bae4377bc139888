"""Text-analysis column functions (all JVM-side Spark expressions —
no Python UDFs in any hot path, so every one of these stays inside
whole-stage codegen at 100 TB).

These back the declared text queries (workload/pipeline.py:
q_langid_heuristic, q_quality_score, q_token_regex_count,
q_doc_fingerprint, q_text_stats) and are reusable as a library:
each takes column names and returns a Column.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: tiny English stopword set for the language-ID heuristic
EN_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for")


def tokens(col: str = "text") -> Column:
    """Whitespace tokens as an array column."""
    return F.split(F.col(col), r"\s+", -1)


def token_count(col: str = "text") -> Column:
    return F.size(tokens(col))


def word_regex_count(col: str = "text", pattern: str = "[a-z]+") -> Column:
    """BPE-ish token counting by regex class (JVM regexp engine)."""
    return F.regexp_count(col, F.lit(pattern))


def stopword_ratio(col: str = "text", stopwords=EN_STOPWORDS) -> Column:
    toks = tokens(col)
    stop = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return stop.cast("double") / F.size(toks)


def avg_word_len(col: str = "text") -> Column:
    return (F.length(F.replace(F.col(col), F.lit(" "), F.lit("")))
            .cast("double") / F.size(tokens(col)))


def punct_ratio(col: str = "text") -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    total = F.length(col).cast("double")
    punct = F.length(F.regexp_replace(F.col(col), r"[A-Za-z0-9\s]", ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def lang_guess(col: str = "text", threshold: float = 0.08) -> Column:
    """n-gram/stopword heuristic language ID: 'en' when the stopword
    ratio clears the threshold."""
    return (F.when(stopword_ratio(col) > threshold, "en")
            .otherwise("other"))


def quality_passes(col: str = "text", min_tokens: int = 20,
                   max_tokens: int = 1000, min_awl: float = 2.0,
                   max_awl: float = 12.0) -> Column:
    """Training-data quality gate: token count and mean word length
    inside sane bands (the length/punct family of corpus filters)."""
    n = token_count(col)
    awl = avg_word_len(col)
    return (F.when(n.between(min_tokens, max_tokens)
                   & awl.between(min_awl, max_awl), 1).otherwise(0))


def fingerprint(col: str = "text") -> Column:
    """64-bit rolling document fingerprint: fold xxhash64 over the token
    array (order-sensitive, deterministic, collision-resistant enough
    for dedup bucketing)."""
    return F.expr(
        f"aggregate(split({col}, '\\\\s+', -1), 0L,"
        f" (acc, t) -> xxhash64(acc, t))")


def ngrams(col: str = "text", n: int = 3) -> Column:
    """Word n-grams as an array column (shared with dedup shingling)."""
    from ..operators.dedup import word_shingles

    return word_shingles(col, n)


def ngram_jaccard(col_a: str, col_b: str, n: int = 3) -> Column:
    """Exact n-gram Jaccard similarity between two text columns."""
    ga, gb = ngrams(col_a, n), ngrams(col_b, n)
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    union = F.size(F.array_union(ga, gb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
