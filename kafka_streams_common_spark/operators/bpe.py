"""Distributed BPE tokenizer training — iterative pair-merge over the
weighted word vocabulary.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016 byte-pair encoding): start from characters plus an end-of-word
marker, repeatedly count adjacent symbol pairs across the corpus and
merge the most frequent one. Entirely outside the reference's surface
(its only text handling is JSON serde — ``SerdeFactory.java``,
``JsonStringToObjectMapper.java``).

Scale shape — the standard vocabulary trick makes this tractable at
100 TB: the corpus is scanned ONCE to build the distinct-word frequency
table (one hash aggregation; |vocab| ≪ corpus, typically millions of
rows for a web-scale corpus), and every merge iteration then runs on
the vocabulary only — a pair census (explode ≤ word-length rows per
word, map-side combine, argmax collect of ONE row — constant driver
data per iteration, the k-means/IVF train-on-aggregate convention) and
a map-only fold that applies the merge to each word's symbol array.
The vocab table is re-checkpointed each iteration so the plan stays
flat instead of accumulating ``n_merges`` nested transforms.

The merge census counts every adjacent occurrence (overlaps included:
"aaa" contributes (a,a) twice) and merge application is greedy
leftmost-first — both exactly the classic reference semantics, pinned
by the pure-Python equivalence test in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Distinct-word counts: ``(word, c)`` — the one corpus-sized pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """``(sym array<string>, c)`` — characters plus the end-of-word mark."""
    return words.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("sym"),
        "c",
    )


def _pair_census(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the current symbol arrays."""
    n = F.size("sym")
    pairs = F.arrays_zip(
        F.slice("sym", 1, n - 1).alias("l"),
        F.slice("sym", 2, n - 1).alias("r"),
    )
    return (
        vocab.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "c")
        .groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum("c").alias("pair_count"))
    )


def _apply_merge(sym: Column, left: str, right: str) -> Column:
    """Greedy leftmost-first merge of (left, right) -> left||right via an
    array-accumulator fold — one whole-stage-codegen expression, no UDF."""
    merged = F.lit(left + right)
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges; returns the learned merge table
    ``[(left, right, pair_count), ...]`` in merge order.

    Ties in the pair census break deterministically on
    (count desc, left asc, right asc) so the merge table is identical on
    any engine, partitioning, or cluster size. Stops early if no pair
    remains (fully merged vocabulary).

    The returned list is ``n_merges`` tuples of driver-side constants —
    the model artifact, not data (same posture as the k-means centroid
    train: constant-size driver state, all heavy lifting distributed).
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = docs.sparkSession
    vocab = _initial_symbols(word_frequencies(docs, text_col)).localCheckpoint(
        eager=True
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_census(vocab)
            .orderBy(
                F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym")
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = (
            top[0]["left_sym"],
            top[0]["right_sym"],
            int(top[0]["pair_count"]),
        )
        merges.append((left, right, cnt))
        vocab = vocab.select(
            _apply_merge(F.col("sym"), left, right).alias("sym"), "c"
        ).localCheckpoint(eager=True)
    return merges


def bpe_merge_table(
    docs: DataFrame, n_merges: int = 32, text_col: str = "text"
) -> DataFrame:
    """The merge table as a DataFrame ``(merge_rank, left_sym, right_sym,
    pair_count)`` — convenience wrapper for pipelines that persist the
    tokenizer artifact next to the corpus."""
    merges = bpe_train(docs, n_merges, text_col)
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (i + 1, left, right, cnt)
            for i, (left, right, cnt) in enumerate(merges)
        ],
        "merge_rank BIGINT, left_sym STRING, right_sym STRING, pair_count BIGINT",
    )
