"""Record linkage: blocked fuzzy matching against a reference dictionary.

The entity-resolution step of a data-integration pipeline: noisy strings
(typos, OCR drops, inconsistent entry) resolved to canonical reference
entities. The reference has nothing in this space; the Spark-first
construction is the same inverted-index discipline as the fuzzy-dedup
tier — candidates come from equi-joins on BLOCKING keys (shared tokens),
never an all-pairs comparison, and the expensive edit-distance runs only
on blocked candidates.

At 100 TB: the dirty side streams once through a token explode; the
reference dictionary (entities are a curated vocabulary, orders of
magnitude smaller than the facts) broadcasts its token index; edit
distance is a JVM builtin (``levenshtein``) evaluated per candidate, and
the best-match argmin is a hash aggregation keyed on the dirty id. A
single-token typo can break one token, so multi-token names still share
at least one blocking token with their entity — for SINGLE-token names
(where the typo breaks the only blocking key) pass
``blocking="ngram"``: character n-grams as the blocking keys, same
inverted-index shape, finer keys — a single edit destroys at most
``ngram_size`` of the name's n-grams, so recall survives any one typo
in any name of length > 2·ngram_size − 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_match_to_reference(
    dirty: DataFrame,
    reference: DataFrame,
    dirty_name_col: str,
    ref_name_col: str,
    id_col: str,
    max_distance: int = 2,
    blocking: str = "token",
    ngram_size: int = 3,
) -> DataFrame:
    """Resolve each dirty row to its best reference entity.

    Blocking: a candidate pair must share at least one key —
    whitespace tokens (``blocking="token"``, the multi-token-name
    default) or character n-grams (``blocking="ngram"``, ``ngram_size``
    chars; the single-token-name mode — a typo inside the only token
    breaks token blocking entirely but destroys at most ``ngram_size``
    n-grams). Names shorter than ``ngram_size`` contribute themselves
    as the one key.
    Verification: ``levenshtein(dirty, ref) <= max_distance``.
    Resolution: per dirty id, the (distance, ref_name)-minimal match —
    deterministic under ties. Returns
    ``(id_col, dirty_name, matched_name, distance)``; unmatched dirty
    rows keep NULL matched_name/distance (they need a human or a finer
    blocking pass, not a silent drop).
    """
    if blocking not in ("token", "ngram"):
        raise ValueError(f"unknown blocking mode: {blocking!r}")

    def keys(col: str):
        if blocking == "token":
            return F.explode(F.split(F.col(col), " "))
        n = int(ngram_size)
        return F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length({col}) - {n} + 1,"
                f" 1)), i -> substring({col}, i, {n}))"
            )
        )

    d_tok = dirty.select(
        F.col(id_col),
        F.col(dirty_name_col).alias("__dirty"),
        keys(dirty_name_col).alias("__tok"),
    ).filter(F.col("__tok") != "")
    r_tok = (
        reference.select(F.col(ref_name_col).alias("__ref"))
        .distinct()
        .select("__ref", keys("__ref").alias("__tok"))
        .filter(F.col("__tok") != "")
        .distinct()
    )
    cand = (
        d_tok.join(F.broadcast(r_tok), "__tok")
        .select(id_col, "__dirty", "__ref")
        .distinct()
        .withColumn("__dist", F.levenshtein(F.col("__dirty"), F.col("__ref")))
        .filter(F.col("__dist") <= max_distance)
    )
    best = cand.groupBy(id_col).agg(
        F.min(F.struct("__dist", "__ref")).alias("__best"),
        F.first("__dirty").alias("__dn"),
    )
    return (
        dirty.select(F.col(id_col), F.col(dirty_name_col).alias("dirty_name"))
        .join(best, id_col, "left")
        .select(
            id_col,
            "dirty_name",
            F.col("__best").getField("__ref").alias("matched_name"),
            F.col("__best").getField("__dist").cast("bigint").alias("distance"),
        )
    )
