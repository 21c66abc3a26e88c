"""Text-analysis operators over a document corpus — all built-in column
expressions (split / higher-order functions / regexp), zero Python UDFs, so
they run inside whole-stage codegen and scale linearly with corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_common_spark.functions.hashing import md5_int64

# Tiny per-language stopword profiles for the n-gram/stopword-voting
# language heuristic. Order matters: ties resolve to the earlier entry.
LANG_PROFILES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "a", "of", "and", "to", "is", "in")),
    ("de", ("der", "die", "das", "und", "ist", "zu", "ein")),
    ("es", ("el", "la", "los", "y", "es", "de", "que")),
    ("fr", ("le", "les", "des", "et", "est", "un", "une")),
    ("zh", ("的", "了", "是", "在", "我")),
)


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def text_quality(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics: the standard cheap filters a training
    pipeline gates on (length, token shape, repetition, symbol noise)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")), F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (sum_len / n_tokens).alias("avg_token_len"),
        (F.size(F.array_distinct(toks)) / n_tokens).alias("distinct_token_ratio"),
        (
            F.length(F.regexp_replace(F.col(text_col), "[a-z0-9 ]", "")) / F.length(F.col(text_col))
        ).alias("symbol_ratio"),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (≈ len/4 per word
    — the standard "chars/4" rule of thumb, computed per-token so long words
    weigh in correctly)."""
    toks = _tokens(text_col)
    bpeish = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / 4.0).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("bigint").alias("ws_tokens"),
        bpeish.alias("bpeish_tokens"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language heuristic: score each language by how many
    tokens (with multiplicity) hit its profile; argmax wins, ties resolve in
    profile order, all-zero scores → 'und' (undetermined)."""
    toks = _tokens(text_col)

    def profile_score(words: tuple[str, ...]) -> Column:
        # single-arg lambda: a second (defaulted) param would make PySpark
        # pass the element index into it
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scores = {lang: profile_score(words) for lang, words in LANG_PROFILES}
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang, _ in reversed(LANG_PROFILES):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    cols = [F.col(id_col).alias("doc_id"), pred.alias("lang_pred"), best.alias("best_score")]
    return docs.select(*cols)


def document_fingerprints(
    docs: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content fingerprints: full-text digest + a min-shingle (winnowing-
    style) fingerprint robust to local edits. Both md5-derived 60-bit ints."""
    toks = _tokens(text_col)
    starts = F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(toks) - (n - 1)))
    shingle_hashes = F.transform(
        starts, lambda i: md5_int64(F.concat_ws(" ", F.slice(toks, i, n)))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        md5_int64(F.col(text_col)).alias("full_digest"),
        F.array_min(shingle_hashes).alias("min_shingle_fp"),
    )
