"""Text-analysis queries over ``documents`` with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_common_spark.operators.text import (
    LANG_PROFILES,
    document_fingerprints,
    lang_id,
    text_quality,
    token_counts,
)
from kafka_streams_common_spark.queries.registry import query, table


@query(
    "text_quality_metrics",
    oracle="""
    WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id,
           length(text) AS n_chars,
           len(t) AS n_tokens,
           list_sum(list_transform(t, x -> CAST(length(x) AS BIGINT))) / len(t)
             AS avg_token_len,
           len(list_distinct(t)) / len(t) AS distinct_token_ratio,
           length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) / length(text)
             AS symbol_ratio
    FROM toks
    """,
)
def text_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_quality(table(spark, sf_dir, "documents"))


@query(
    "text_token_counts",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS ws_tokens,
           CAST(list_sum(list_transform(t, x -> CAST(ceil(length(x) / 4.0) AS BIGINT)))
                AS BIGINT) AS bpeish_tokens
    FROM toks
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(table(spark, sf_dir, "documents"))


def _lang_id_oracle() -> str:
    score_exprs = []
    for lang, words in LANG_PROFILES:
        in_list = ", ".join(f"'{w}'" for w in words)
        score_exprs.append(f"len(list_filter(t, x -> x IN ({in_list}))) AS s_{lang}")
    scores = ", ".join(score_exprs)
    names = [lang for lang, _ in LANG_PROFILES]
    best = "greatest(" + ", ".join(f"s_{n}" for n in names) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for n in names:  # profile order = tie-break order (matches Spark chain)
        case += f"WHEN s_{n} = {best} THEN '{n}' "
    case += "END"
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    scored AS (SELECT doc_id, {scores} FROM toks)
    SELECT doc_id, {case} AS lang_pred, {best} AS best_score FROM scored
    """


@query("text_lang_id", oracle=_lang_id_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(table(spark, sf_dir, "documents"))


@query(
    "text_quality_filter",
    oracle="""
    WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
    m AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(t) AS n_tokens,
             len(list_distinct(t)) / len(t) AS distinct_token_ratio
      FROM toks
    )
    SELECT doc_id, n_chars, n_tokens FROM m
    WHERE n_tokens >= 25 AND distinct_token_ratio >= 0.4
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of quality scoring — the C4-style corpus filter a
    training pipeline actually runs: compute per-document metrics, keep
    documents passing length and repetition thresholds. Thresholds chosen
    to bite on the fixture (~half the corpus passes)."""
    from pyspark.sql import functions as F

    m = text_quality(table(spark, sf_dir, "documents"))
    return m.filter(
        (F.col("n_tokens") >= 25) & (F.col("distinct_token_ratio") >= 0.4)
    ).select("doc_id", "n_chars", "n_tokens")


@query(
    "text_top_words",
    oracle="""
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w ORDER BY n DESC, w LIMIT 20
    """,
)
def text_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral/flatten + top-k: corpus-wide token frequencies (the
    explode-then-aggregate shape every vocab/BPE-training pass starts with)."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@query(
    "text_fingerprints",
    oracle="""
    WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id,
           ('0x' || substr(md5(text), 1, 15))::BIGINT AS full_digest,
           list_min(list_transform(
             generate_series(1, greatest(1, len(t) - 4)),
             i -> ('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))::BIGINT
           )) AS min_shingle_fp
    FROM toks
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return document_fingerprints(table(spark, sf_dir, "documents"), n=5)


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH salted AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-0100' AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
           regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text
    FROM salted
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance pass every training-data pipeline
    runs before a corpus ships: count and mask email addresses and phone
    numbers with built-in regexp functions (JVM-side, global replace; the
    pattern set is a config surface in a real deployment). The fixture
    corpus is synthetic and PII-free, so the query plants one email and one
    phone per document deterministically — the scrub then has real work
    whose output both engines must agree on byte-for-byte."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-0100"),
        ).alias("t"),
    )
    return salted.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_PHONE_RE)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("clean_text"),
    )


@query(
    "text_hash_sample",
    oracle="SELECT doc_id, text FROM documents"
    " WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0",
)
def text_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling — reproducible corpus subsampling (the
    ablation/holdout primitive): keep the ~10% of documents whose md5(id)
    falls in bucket 0. Unlike ``DataFrame.sample``, the selection is a pure
    function of the id — stable across runs, engines, partitionings and
    cluster sizes, so a sampled training set can be reproduced bit-for-bit
    anywhere. Filter is a scan-level predicate; no shuffle."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.functions.hashing import md5_int64

    docs = table(spark, sf_dir, "documents")
    return docs.filter(F.pmod(md5_int64("doc_id"), F.lit(10)) == 0).select(
        "doc_id", "text"
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM w WHERE term <> '' GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_common_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(table(spark, sf_dir, "documents"), k=3)


@query(
    "text_repetition_metrics",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i + 1])) AS bigram
      FROM toks
    ),
    per AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           round(max(c) / sum(c), 6) AS top_bigram_frac,
           round(count(*) / sum(c), 6) AS distinct_bigram_ratio
    FROM per GROUP BY doc_id
    """,
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_common_spark.operators.text import bigram_repetition

    return bigram_repetition(table(spark, sf_dir, "documents"))


# Per-language keep-percentages for the stratified sample: downsample the
# dominant language, keep low-resource strata at higher rates.
_STRATA_RATES = {"en": 30, "de": 80, "es": 80, "fr": 80, "zh": 100}


def _stratified_oracle() -> str:
    case = "CASE lang " + " ".join(
        f"WHEN '{s}' THEN {p}" for s, p in _STRATA_RATES.items()
    ) + " ELSE 0 END"
    return (
        "SELECT doc_id, lang, text FROM documents "
        "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT "
        f"% 100 < {case}"
    )


@query("text_stratified_sample", oracle=_stratified_oracle())
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_common_spark.operators.text import stratified_hash_sample

    return stratified_hash_sample(
        table(spark, sf_dir, "documents"), _STRATA_RATES, strata_col="lang"
    ).select("doc_id", "lang", "text")


_SPLIT_WEIGHTS = {"train": 80, "val": 10, "test": 10}


def _split_oracle() -> str:
    return """
    SELECT doc_id, lang,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     % 100 < 80 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """


@query("text_hash_split", oracle=_split_oracle())
def text_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment (md5-bucket split —
    see operators.text.hash_split)."""
    from kafka_streams_common_spark.operators.text import hash_split

    return hash_split(table(spark, sf_dir, "documents"), _SPLIT_WEIGHTS).select(
        "doc_id", "lang", "split"
    )


_PACK_BUDGET = 512
_PACK_GROUPS = 8


@query(
    "llm_pack_sequences",
    oracle=f"""
    SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % {_PACK_GROUPS} AS BIGINT) AS grp,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           TRUE AS budget_ok,
           TRUE AS pack_count_bounded
    FROM documents GROUP BY 1
    """,
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, driver-checkable: the pack ASSIGNMENT itself is not
    SQL-replayable (greedy packing has no relational spelling), so the query
    emits the per-group invariant projection instead — document and token
    conservation (hash-gated against the oracle's direct computation) plus
    two booleans the packing must make true: no multi-doc pack over budget,
    and pack count within [ceil(capped_tokens/budget), n_docs]. The lower
    bound caps each document at the budget before summing
    (``sum(least(n_tokens, budget))``): an OVERSIZED document legally
    occupies one singleton pack yet would contribute ≥2 to the uncapped
    ceiling, so the uncapped bound is violated by a CORRECT packing on
    unseen data — the capped form holds for any input (every pack's capped
    token mass is ≤ budget, so capped_total ≤ n_packs·budget). A packing
    bug (lost doc, split doc, over-stuffed or degenerate packs) still
    flips a value and fails the driver's hash gate."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.text import pack_sequences

    packed = pack_sequences(
        table(spark, sf_dir, "documents"),
        budget_tokens=_PACK_BUDGET,
        n_groups=_PACK_GROUPS,
    )
    per_pack = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tok"),
        # per-doc cap: oversized singletons count as one budget, not many
        F.sum(F.least(F.col("n_tokens"), F.lit(_PACK_BUDGET))).alias("ctok"),
        F.count(F.lit(1)).alias("docs"),
    )
    per_grp = per_pack.groupBy(
        F.shiftright(F.col("pack_id"), 32).alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("docs").cast("bigint").alias("n_docs"),
        F.sum("tok").cast("bigint").alias("total_tokens"),
        F.sum("ctok").alias("capped_tokens"),
        (
            F.max(
                F.when((F.col("tok") > _PACK_BUDGET) & (F.col("docs") > 1), 1).otherwise(0)
            )
            == 0
        ).alias("budget_ok"),
    )
    return per_grp.select(
        "grp",
        "n_docs",
        "total_tokens",
        "budget_ok",
        (
            (F.col("n_packs") >= F.ceil(F.col("capped_tokens") / F.lit(_PACK_BUDGET)))
            & (F.col("n_packs") <= F.col("n_docs"))
        ).alias("pack_count_bounded"),
    )


_SHARD_COUNT = 4
_SHARD_MAX_ROWS = 100


@query(
    "llm_corpus_shards",
    oracle="""
    SELECT TRUE AS shard_count_ok,
           CAST(count(*) AS BIGINT) AS n_docs,
           TRUE AS row_budget_ok,
           TRUE AS ranges_disjoint
    FROM documents
    """,
)
def llm_corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus shard writer, driver-checkable: writes the corpus as
    range-partitioned parquet shards (sinks.write_corpus_shards) to a temp
    directory, reads the files back, and emits the writer's post-conditions
    as one hash-gated row — bounded shard count, total-row conservation,
    per-file row budget (maxRecordsPerFile), and global range ordering
    (every shard's doc_id range strictly precedes the next shard's). A
    writer bug (dropped rows, oversized file, hash-instead-of-range
    placement) flips a value and fails the gate.

    The shard identity is the PERSISTED ``shard`` column the writer stamps
    (``spark_partition_id`` after the range exchange) — never parsed from
    Spark's ``part-NNNNN`` file naming, which is convention, not contract.
    And because ``repartitionByRange`` samples its boundaries, an empty
    range (possible on tiny/skewed input) is legal — the gate pins
    ``1 ≤ n_shards ≤ num_shards`` as a boolean rather than an exact count
    that driver-side data could legitimately miss."""
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.sinks import write_corpus_shards

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="kscs_shards_")
    atexit.register(shutil.rmtree, tmp, True)  # reap at interpreter exit
    out = tmp + "/out"
    write_corpus_shards(
        docs, out, "doc_id", num_shards=_SHARD_COUNT,
        max_records_per_file=_SHARD_MAX_ROWS, shard_id_col="shard",
    )
    back = spark.read.parquet(out).select(
        "doc_id", "shard", F.input_file_name().alias("file")
    )
    per_file = back.groupBy("file", "shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    )
    per_shard = per_file.groupBy("shard").agg(
        F.sum("n").alias("rows"),
        F.max("n").alias("max_file_rows"),
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
    )
    w = Window.orderBy("shard")  # ≤4 rows — the single partition is fine here
    flags = per_shard.select(
        "rows", "max_file_rows", "lo", "hi", F.lag("hi").over(w).alias("prev_hi")
    )
    return flags.agg(
        F.count(F.lit(1)).between(1, _SHARD_COUNT).alias("shard_count_ok"),
        F.sum("rows").cast("bigint").alias("n_docs"),
        (F.max("max_file_rows") <= F.lit(_SHARD_MAX_ROWS)).alias("row_budget_ok"),
        F.min(
            F.when(
                F.col("prev_hi").isNull() | (F.col("prev_hi") < F.col("lo")), True
            ).otherwise(False)
        ).alias("ranges_disjoint"),
    )


@query(
    "llm_token_budget_shards",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS off
      FROM t
    )
    SELECT CAST(off // 20000 AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tok_total,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM r GROUP BY 1
    """,
)
def llm_token_budget_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-preserving token-budget sharding
    (``operators/text.py: token_budget_shards``): cut the corpus, in
    deterministic doc_id order, into contiguous ~20k-token shards —
    ``shard = floor(start_offset / budget)`` on the EXACT global token
    prefix. The writer shape for reproducible-order dataloaders
    (curriculum schedules, resumable epochs), complementing
    ``llm_pack_sequences`` (order-free fill-maximizing packing) and
    ``llm_corpus_shards`` (row-budgeted range shards). The exact global
    running sum comes from the distributed bucketed prefix
    (``operators/prefix.py``) — no single-partition sort — and the
    oracle replays the plain running-sum form bit-for-bit; the readout
    aggregates each shard's doc count, token total, and id range (the
    contiguity witness: ranges are disjoint and ordered by shard)."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.text import (
        token_budget_shards,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    shards = token_budget_shards(docs, 20000)
    return shards.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tok_total"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    t AS (SELECT doc_id, term FROM w WHERE term <> ''),
    v AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
    n AS (SELECT count(*) AS total FROM t),
    s AS (
      SELECT doc_id,
             CAST(round(-ln(CAST(cnt AS DOUBLE) / total), 6)
                  AS DECIMAL(28,12)) AS nl
      FROM t JOIN v USING (term) CROSS JOIN n
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_scored,
           round(CAST(sum(nl) AS DOUBLE) / count(*), 6) AS avg_neg_logprob
    FROM s GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM scoring (operators.text.unigram_logprob) — the
    perplexity-filter stand-in. Per-token −ln p rounded to 6 dp then
    summed as DECIMAL(28,12) on BOTH engines, so the aggregation is exact
    and ordering-free (hash-gateable despite being a float pipeline)."""
    from kafka_streams_common_spark.operators.text import unigram_logprob

    return unigram_logprob(table(spark, sf_dir, "documents"))


@query(
    "text_gopher_quality_rules",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(t) AS n_words,
             list_sum(list_transform(t, x -> CAST(length(x) AS BIGINT)))
               / CAST(len(t) AS DOUBLE) AS mean_word_len,
             CAST(len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]')))
                  AS DOUBLE) / len(t) AS alpha_frac,
             len(list_filter(t, x -> x IN ('the','be','to','of','and',
                                           'that','have','with'))) AS stop_hits
      FROM toks
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           mean_word_len,
           alpha_frac,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           n_words BETWEEN 20 AND 100000 AS word_count_ok,
           mean_word_len BETWEEN 3.0 AND 10.0 AS mean_word_len_ok,
           alpha_frac >= 0.80 AS alpha_frac_ok,
           stop_hits >= 2 AS stop_words_ok,
           (n_words BETWEEN 20 AND 100000)
             AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND alpha_frac >= 0.80
             AND stop_hits >= 2 AS keep
    FROM m
    """,
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality battery (operators.text.gopher_quality): the
    pre-training document gate — word-count bounds, mean-word-length band,
    alphabetic-token fraction, stop-word presence — emitted per document
    with per-rule booleans AND the conjunction, all on one map-only scan.
    The oracle replays every rule and threshold verbatim."""
    from kafka_streams_common_spark.operators.text import gopher_quality

    return gopher_quality(table(spark, sf_dir, "documents"))


@query(
    "text_bigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    ex AS (
      SELECT doc_id, t, unnest(generate_series(2, len(t))) AS i FROM toks
    ),
    pc AS (
      SELECT doc_id, t[i-1] AS prev, t[i] AS cur FROM ex
    ),
    vocab AS (
      SELECT w AS term, count(*) AS c1
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w != '' GROUP BY w
    ),
    tot AS (SELECT sum(c1) AS total FROM vocab),
    big AS (SELECT prev, cur, count(*) AS c2 FROM pc GROUP BY prev, cur),
    ctx AS (SELECT prev, count(*) AS cprev FROM pc GROUP BY prev),
    sc AS (
      SELECT pc.doc_id,
             CAST(round(-ln(0.7 * (CAST(c2 AS DOUBLE) / CAST(cprev AS DOUBLE))
                            + (1.0 - 0.7) * (CAST(c1 AS DOUBLE)
                                             / CAST(total AS DOUBLE))), 6)
                  AS DECIMAL(28,12)) AS nl
      FROM pc
      JOIN big USING (prev, cur)
      JOIN ctx USING (prev)
      JOIN vocab ON vocab.term = pc.cur
      CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(nl) AS DOUBLE) / count(*) AS avg_neg_logprob
    FROM sc GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM scoring (operators.text.bigram_logprob) —
    the perplexity-filter upgrade over the unigram model: per-bigram
    −ln(λ·p(cur|prev) + (1−λ)·p(cur)) under corpus counts, rounded to
    6 dp and summed as DECIMAL(28,12) on both engines so the float
    pipeline stays hash-gateable. The interpolation weight is spelled
    (1.0 − 0.7) on BOTH sides — the IEEE value differs from the literal
    0.3 and the oracle must replay the engine's arithmetic exactly."""
    from kafka_streams_common_spark.operators.text import bigram_logprob

    return bigram_logprob(table(spark, sf_dir, "documents"), lam=0.7)


@query(
    "llm_mix_corpus_tokens",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    tot AS (SELECT lang, sum(n_tokens) AS st FROM t GROUP BY lang),
    rates AS (
      SELECT lang,
             CAST(floor(least(1.0,
                    CAST(CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 5000
                                   WHEN 'zh' THEN 2000 WHEN 'es' THEN 1000
                         END AS DOUBLE) / st) * 1000000) AS BIGINT)
               AS rate_ppm
      FROM tot WHERE lang IN ('en', 'de', 'zh', 'es')
    )
    SELECT t.doc_id, t.lang, t.n_tokens
    FROM t JOIN rates USING (lang)
    WHERE ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 1000000 < rates.rate_ppm
    """,
)
def llm_mix_corpus_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing (operators.text.mix_corpus_by_tokens):
    the Pile/Dolma recipe step — down-sample each language to a target
    token budget (en/de 5k, zh 2k, es 1k; fr absent = dropped: a mixing
    recipe is a whitelist), keeping under-budget strata whole (de's 3.5k
    tokens < 5k budget → rate 1.0). Selection is an md5(id) ppm-bucket
    test derived from exact bigint token sums, so both engines replay
    the rate arithmetic and the kept set bit-for-bit. One scalar
    aggregation + broadcast rate join — the corpus never shuffles."""
    from kafka_streams_common_spark.operators.text import mix_corpus_by_tokens

    return mix_corpus_by_tokens(
        table(spark, sf_dir, "documents"),
        {"en": 5000, "de": 5000, "zh": 2000, "es": 1000},
    ).select("doc_id", "lang", "n_tokens")


@query(
    "text_perplexity_filter",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    t AS (SELECT doc_id, term FROM w WHERE term <> ''),
    v AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
    n AS (SELECT count(*) AS total FROM t),
    s AS (
      SELECT doc_id,
             CAST(round(-ln(CAST(cnt AS DOUBLE) / total), 6)
                  AS DECIMAL(28,12)) AS nl
      FROM t JOIN v USING (term) CROSS JOIN n
    ),
    d AS (
      SELECT doc_id,
             round(CAST(sum(nl) AS DOUBLE) / count(*), 6) AS avg_neg_logprob
      FROM s GROUP BY doc_id
    ),
    th AS (SELECT quantile_cont(avg_neg_logprob, 0.9) AS p90 FROM d)
    SELECT doc_id, avg_neg_logprob
    FROM d CROSS JOIN th WHERE avg_neg_logprob <= p90
    """,
)
def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The perplexity GATE — the curation step the LM scorers exist for:
    score every document under the corpus unigram LM, derive the drop
    threshold from the corpus's own score distribution (here: keep at or
    below the 90th percentile — drop the worst-surprise decile), and
    emit the survivors. CCNet/Gopher-style pipelines run exactly this
    composition with a trained LM; the engine-side shape is identical.

    Plan shape: the scorer's own shuffles (see text_unigram_logprob),
    then ONE |docs|-sized aggregate feeds the exact-percentile threshold
    — a single broadcast row probed as a filter; no second corpus pass.
    Exact interpolated ``percentile`` (== DuckDB ``quantile_cont``) over
    the 6-dp-rounded doubles is bit-identical cross-engine, so even the
    boundary document survives identically on both sides. At 100 TB the
    threshold swaps to ``approx_percentile`` (mergeable sketch) and the
    gate becomes approximate-but-stable — the same exact→sketch
    substitution documented on agg_approx_quantiles_value.
    """
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.text import unigram_logprob

    scores = unigram_logprob(table(spark, sf_dir, "documents")).select(
        "doc_id", "avg_neg_logprob"
    )
    thresh = scores.agg(
        F.percentile("avg_neg_logprob", 0.9).alias("__p90")
    )
    return scores.join(
        F.broadcast(thresh), F.col("avg_neg_logprob") <= F.col("__p90")
    ).select("doc_id", "avg_neg_logprob")


@query(
    "text_chunk_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    n AS (SELECT doc_id, t, len(t) AS n FROM toks),
    c AS (
      SELECT doc_id, t,
             unnest(generate_series(
               0,
               CAST(greatest(0, ceil((n - 64) / 48.0)) AS BIGINT)
             )) AS chunk_id
      FROM n
    )
    SELECT doc_id,
           chunk_id,
           CAST(len(t[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(t[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
             AS chunk_text
    FROM c
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: overlapping 64-token windows advancing by 48 tokens
    (16-token overlap) — tokenize once, map-only sequence-explode, no
    shuffle. The oracle replays the same 1-based inclusive slices with
    DuckDB list slicing (``t[a:b]`` inclusive == Spark ``slice(t, a,
    64)`` when ``b = a + 63``)."""
    from kafka_streams_common_spark.operators.text import chunk_documents

    return chunk_documents(
        table(spark, sf_dir, "documents"), chunk_size=64, stride=48
    )


@query(
    "text_corpus_report_rollup",
    oracle="""
    SELECT source, lang,
           count(*) AS n_docs,
           -- DuckDB sum(BIGINT) widens to HUGEINT (pandas float);
           -- pin BIGINT so the dtype family matches Spark's
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY ROLLUP(source, lang)
    """,
)
def text_corpus_report_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: document counts and size stats at
    (source, lang), per-source subtotal, and grand-total levels in ONE
    rollup aggregation — the dashboard a curation pipeline publishes per
    snapshot. Integer sums are exact; the only double is the final
    average of two exact integers. Scale shape: rollup = one partial-agg
    pass with grouping-set expansion, one exchange on the grouping key."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    return docs.rollup("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
            "avg_chars"
        ),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "text_bpe_top_pairs",
    oracle="""
    WITH words AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ),
    syms AS (
      SELECT list_append(string_split_regex(w, ''), '</w>') AS s, c
      FROM words
    ),
    pairs AS (
      SELECT s[i] AS left_sym, s[i + 1] AS right_sym, c
      FROM syms, unnest(generate_series(1, len(s) - 1)) AS t(i)
    )
    SELECT left_sym, right_sym, CAST(sum(c) AS BIGINT) AS pair_count
    FROM pairs GROUP BY left_sym, right_sym
    ORDER BY pair_count DESC, left_sym, right_sym LIMIT 30
    """,
)
def text_bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE training iteration as an oracle-gated query: the
    corpus-wide weighted adjacent symbol-pair census (characters +
    end-of-word marker), top 30 under the trainer's deterministic
    (count desc, left, right) order. The full iterative trainer
    (``operators/bpe.py: bpe_train``) repeats exactly this census + a
    map-only merge fold per iteration over the VOCABULARY (never the
    corpus — the one corpus-sized pass is the word-frequency
    aggregation); its merge-table output is pinned against a pure-Python
    reference implementation in tests/test_bpe.py (iterative argmax is
    not ANSI-SQL-expressible; the census — each iteration's heavy
    distributed step — is, and this row gates it)."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.bpe import (
        _initial_symbols,
        _pair_census,
        word_frequencies,
    )

    docs = table(spark, sf_dir, "documents")
    return (
        _pair_census(_initial_symbols(word_frequencies(docs)))
        .orderBy(F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym"))
        .limit(30)
    )


@query(
    "text_classifier_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           list_sum(list_transform(t,
             x -> ('0x' || substr(md5('w1|' || x), 1, 15))::BIGINT % 2001
                  - 1000)) / 1000.0 AS logit,
           list_sum(list_transform(t,
             x -> ('0x' || substr(md5('w1|' || x), 1, 15))::BIGINT % 2001
                  - 1000)) / 1000.0 > 0.0 AS keep
    FROM toks
    """,
)
def text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped hashed linear quality classifier: md5-hashed token
    weights (integer mills, order-free bigint sum) -> document logit ->
    threshold gate. Map-only, no weight-table join; the md5-derived
    placeholder weights make the score engine-exact so the oracle can
    replay it."""
    from kafka_streams_common_spark.operators.text import classifier_score

    return classifier_score(table(spark, sf_dir, "documents"))


@query(
    "llm_temperature_sample_sources",
    oracle="""
    WITH stats AS (
      SELECT source, count(*) AS n_s FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_s, sqrt(CAST(n_s AS DOUBLE)) AS w_s,
             sum(sqrt(CAST(n_s AS DOUBLE))) OVER () AS w_tot,
             sum(n_s) OVER () AS n_tot
      FROM stats
    ),
    rates AS (
      SELECT source, n_s,
             CAST(floor(least(1.0,
               (0.5 * n_tot * (w_s / w_tot)) / n_s) * 1000000.0) AS BIGINT)
               AS rate_ppm
      FROM w
    )
    SELECT d.doc_id, d.source, r.rate_ppm
    FROM documents d JOIN rates r USING (source)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
            % 1000000 < r.rate_ppm
    """,
)
def llm_temperature_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling across sources (α = 0.5, target ≈ half the
    corpus): per-source budgets ∝ n_s^α flatten the source distribution —
    the multilingual/multi-source rebalancing step of an LLM data recipe
    (upsamples the tail, downsamples the head). The keep decision is a
    pure function of (doc_id, source rate): rates are integer
    PARTS-PER-MILLION derived from one count aggregation, and a document
    survives iff ``md5(doc_id) % 1e6 < rate_ppm`` — reproducible on any
    engine or partitioning, unlike ``DataFrame.sample``.

    Scale shape: one histogram-sized count aggregation, a broadcast rate
    join, and a scan-level filter — the corpus itself is never
    shuffled (same posture as token-budget mixing, which allocates by
    token count where this allocates by doc count with a temperature
    exponent)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.functions.hashing import md5_int64

    docs = table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w = Window.partitionBy()
    rates = stats.select(
        "source",
        F.floor(
            F.least(
                F.lit(1.0),
                (
                    0.5
                    * F.sum("n_s").over(w)
                    * (
                        F.sqrt(F.col("n_s").cast("double"))
                        / F.sum(F.sqrt(F.col("n_s").cast("double"))).over(w)
                    )
                )
                / F.col("n_s"),
            )
            * 1000000.0
        )
        .cast("bigint")
        .alias("rate_ppm"),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(md5_int64(F.col("doc_id")) % 1000000 < F.col("rate_ppm"))
        .select("doc_id", "source", "rate_ppm")
    )


@query(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS norm_text,
           CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT)
             AS n_norm_tokens
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenization text normalization — lowercase, punctuation fold,
    whitespace collapse — the canonical first step before shingling or
    vocab building (normalizing BEFORE dedup is what lets 'Fox!' and
    'fox' collide). Pure JVM regexp chain, map-only, byte-identical on
    both engines (Spark regexp_replace is global by default; the oracle
    passes 'g')."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.size(F.split(norm, " ")).cast("bigint").alias("n_norm_tokens"),
    )


@query(
    "text_url_canonicalize",
    oracle="""
    WITH planted AS (
      SELECT doc_id,
             'https://CDN' || CAST(doc_id % 7 AS VARCHAR)
               || '.Example.COM/p/' || CAST(doc_id AS VARCHAR)
               || '?id=' || CAST(doc_id AS VARCHAR)
               || '&utm_source=feed&utm_campaign=x&ref=rss#sec'
               || CAST(doc_id % 3 AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id,
           url,
           lower(regexp_extract(url, '^https?://([^/]+)', 1)) AS host,
           regexp_replace(regexp_replace(url, '#.*$', ''),
                          '&utm_[^&#]*', '', 'g') AS canon_url
    FROM planted
    """,
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the crawl-dedup step that collapses
    tracking-parameter and fragment variants of one page: lowercase the
    host, strip the fragment, strip utm_* params. The fixture has no URL
    column, so (the ``text_pii_scrub`` convention) each document plants a
    deterministic URL with host-case noise, tracking params and a
    fragment; both engines must then produce byte-identical canonical
    forms. Map-only regexp chain — at crawl scale this runs in the scan
    before the exact-dedup hash."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://CDN"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.COM/p/"),
        F.col("doc_id").cast("string"),
        F.lit("?id="),
        F.col("doc_id").cast("string"),
        F.lit("&utm_source=feed&utm_campaign=x&ref=rss#sec"),
        (F.col("doc_id") % 3).cast("string"),
    )
    planted = docs.select("doc_id", url.alias("url"))
    return planted.select(
        "doc_id",
        "url",
        F.lower(F.regexp_extract("url", "^https?://([^/]+)", 1)).alias("host"),
        F.regexp_replace(
            F.regexp_replace("url", "#.*$", ""), "&utm_[^&#]*", ""
        ).alias("canon_url"),
    )


@query(
    "text_kfold_split",
    oracle="""
    SELECT doc_id,
           ('0x' || substr(md5('fold|' || CAST(doc_id AS VARCHAR)), 1, 15))
             ::BIGINT % 5 AS fold
    FROM documents
    """,
)
def text_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (k=5) — the cross-validation /
    ablation split: each document's fold is a pure function of its id
    (salted md5 bucket), so fold membership is reproducible on any
    engine, run, or cluster size and never leaks across re-shuffles
    (``DataFrame.randomSplit`` is partitioning-dependent). The
    train-side of fold i is ``fold <> i`` — a scan-level predicate, no
    shuffle. Complements ``text_hash_split``'s fixed train/val/test
    ratios with the rotating-holdout shape."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.functions.hashing import md5_int64

    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        (
            md5_int64(F.concat(F.lit("fold|"), F.col("doc_id").cast("string")))
            % 5
        ).alias("fold"),
    )


@query(
    "llm_dsir_importance_weights",
    oracle="""
    WITH tokened AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest(list_transform(
        generate_series(2, len(t)), i -> t[i-1] || ' ' || t[i]
      )) AS bigram
      FROM tokened WHERE len(t) >= 2
    ),
    dc AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(bigram AS VARCHAR)), 1, 15))::BIGINT
               % 4096 AS bucket,
             count(*) AS m
      FROM grams GROUP BY 1, 2
    ),
    cc AS (SELECT bucket, sum(m) AS cc FROM dc GROUP BY 1),
    tc AS (
      SELECT dc.bucket, sum(dc.m) AS tc
      FROM dc JOIN documents USING (doc_id)
      WHERE documents.lang = 'en' GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT sum(cc) FROM cc) AS ctot,
             (SELECT sum(tc) FROM tc) AS ttot
    ),
    lr AS (
      SELECT cc.bucket,
             CAST(round(ln(
               (CAST(coalesce(tc.tc, 0) + 1 AS DOUBLE)
                  / CAST(tot.ttot + 4096 AS DOUBLE))
               / (CAST(cc.cc + 1 AS DOUBLE)
                  / CAST(tot.ctot + 4096 AS DOUBLE))
             ), 6) AS DECIMAL(18,6)) AS lr
      FROM cc LEFT JOIN tc ON cc.bucket = tc.bucket, tot
    ),
    sc AS (
      SELECT dc.doc_id, sum(dc.m) AS n_bigrams, sum(dc.m * lr.lr) AS sum_lr
      FROM dc JOIN lr USING (bucket) GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(sc.sum_lr AS DOUBLE) / sc.n_bigrams AS dsir_score,
           coalesce(CAST(sc.sum_lr AS DOUBLE) / sc.n_bigrams > 0, FALSE)
             AS keep
    FROM documents d LEFT JOIN sc USING (doc_id)
    """,
)
def llm_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights over the fixture corpus with the
    English subset as the target domain
    (``operators/text.py: dsir_importance_weights``): every document
    scored by its hashed-bigram log-likelihood ratio between target and
    corpus distributions — the importance-resampling filter a
    pretraining pipeline uses to tilt a crawl toward a domain without
    training a classifier. The oracle replays the same 4096-bucket
    model with the md5 bucket hash and 6 dp DECIMAL log-ratios, so the
    scores are bit-equal."""
    from kafka_streams_common_spark.operators.text import dsir_importance_weights

    docs = table(spark, sf_dir, "documents")
    target = docs.filter("lang = 'en'")
    return dsir_importance_weights(docs, target, n_buckets=4096)


@query(
    "llm_weighted_sample_docs",
    oracle="""
    SELECT doc_id, n_chars, sample_key
    FROM (
      SELECT doc_id, n_chars,
             round(
               ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   + 1) / 1152921504606846976.0)
               / CAST(n_chars AS DOUBLE), 12) AS sample_key
      FROM documents WHERE CAST(n_chars AS DOUBLE) > 0
    )
    ORDER BY sample_key DESC, doc_id
    LIMIT 100
    """,
)
def llm_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement
    (``operators/text.py: weighted_priority_sample``): 100 documents
    drawn with inclusion odds proportional to length — the
    Efraimidis–Spirakis priority trick (top-k of ``u^{1/w}`` keys) that
    turns sequential reservoir sampling into one distributed
    TakeOrderedAndProject. md5-derived uniforms make the draw
    bit-reproducible on any engine; the oracle replays the identical
    key arithmetic."""
    from kafka_streams_common_spark.operators.text import (
        weighted_priority_sample,
    )

    docs = table(spark, sf_dir, "documents")
    return weighted_priority_sample(docs, k=100, weight_col="n_chars").select(
        "doc_id", "n_chars", "sample_key"
    )


@query(
    "eval_classifier_auc",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS pos, string_split(text, ' ') AS t
      FROM documents
    ),
    s AS (
      SELECT doc_id, pos,
             CAST(list_sum(list_transform(t,
               x -> ('0x' || substr(md5('w1|' || x), 1, 15))::BIGINT % 2001
                    - 1000)) AS BIGINT) AS mills
      FROM toks
    ),
    hist AS (
      SELECT mills,
             sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np_s,
             sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS nn_s
      FROM s GROUP BY mills
    ),
    c AS (
      SELECT np_s, nn_s,
             coalesce(sum(nn_s) OVER (
               ORDER BY mills
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS below
      FROM hist
    )
    SELECT CAST(sum(np_s) AS BIGINT) AS n_pos,
           CAST(sum(nn_s) AS BIGINT) AS n_neg,
           CAST(sum(np_s * (2 * below + nn_s)) AS DOUBLE)
             / CAST(2 * sum(np_s) * sum(nn_s) AS DOUBLE) AS auc
    FROM c
    """,
)
def eval_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the hashed linear classifier against a weak label
    (lang = 'en') — the Mann-Whitney readout every data-quality
    classifier ships with before it gates a corpus. Computed the
    scalable way: NOT a corpus-wide rank window but a SCORE HISTOGRAM —
    group by the exact integer-mills logit, then one ordered pass over
    the histogram accumulates, for each score, the negatives strictly
    below it; ``Σ np_s·(2·below + nn_s) / (2·np·nn)`` is exactly the
    tie-averaged pairwise win rate (the ×2 keeps half-credit for ties
    in integers until the final division). The ordered pass runs over
    |distinct scores| rows — bounded by the logit's value range, not
    the corpus — and even that goes through the bucketed distributed
    prefix (``operators/prefix.py``), so no single-partition sort
    exists at any width; the scoring itself is the map-only hash fold
    (``operators/text.py: classifier_logit_mills``). Everything before
    the one double division is exact integer arithmetic."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.prefix import global_prefix
    from kafka_streams_common_spark.operators.text import (
        classifier_logit_mills,
    )

    docs = table(spark, sf_dir, "documents")
    scored = classifier_logit_mills(
        docs, extra_cols=((F.col("lang") == "en").alias("pos"),)
    )
    hist = scored.groupBy(F.col("logit_mills").alias("mills")).agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np_s"),
        F.sum(F.when(~F.col("pos"), 1).otherwise(0)).alias("nn_s"),
    )
    # exclusive prefix over the score histogram via the bucketed
    # distributed prefix (operators/prefix.py) — the histogram is
    # value-bounded but can still be wide; nothing single-partitions
    c = global_prefix(hist, ["mills"], sum_cols=["nn_s"]).select(
        "np_s",
        "nn_s",
        (F.col("run_nn_s") - F.col("nn_s")).alias("below"),
    )
    return c.agg(
        F.sum("np_s").cast("bigint").alias("n_pos"),
        F.sum("nn_s").cast("bigint").alias("n_neg"),
        (
            F.sum(
                F.col("np_s") * (2 * F.col("below") + F.col("nn_s"))
            ).cast("double")
            / (2 * F.sum("np_s") * F.sum("nn_s")).cast("double")
        ).alias("auc"),
    )


@query(
    "eval_calibration_bins",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS pos, string_split(text, ' ') AS t
      FROM documents
    ),
    s AS (
      SELECT doc_id, pos,
             CAST(list_sum(list_transform(t,
               x -> ('0x' || substr(md5('w1|' || x), 1, 15))::BIGINT % 2001
                    - 1000)) AS BIGINT) AS mills
      FROM toks
    ),
    b AS (
      SELECT pos, mills,
             ntile(10) OVER (ORDER BY mills, doc_id) AS bin
      FROM s
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(mills) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000.0
             AS mean_logit,
           CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS pos_rate
    FROM b GROUP BY bin
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve of the classifier score: decile bins of the
    exact integer-mills logit (ties broken by doc_id — a total,
    engine-exact order) vs the observed positive rate (lang = 'en') per
    bin — the reliability diagram that tells you whether a gate
    threshold means what its score claims. Mean logit and positive rate
    are single double divisions of exact integer sums. Exact-ntile
    semantics WITHOUT the global single-partition sort: a bounded
    approx-quantile boundary set buckets the corpus, per-bucket row
    counts broadcast back as rank offsets, and the decile index is
    recomputed from the exact global rank via the shared ntile algebra
    (``operators/prefix.py``) — bit-identical to
    ``ntile(10) OVER (ORDER BY mills, doc_id)`` (the oracle keeps that
    exact form) while every corpus-sized sort stays per-bucket
    parallel."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.prefix import (
        global_prefix,
        ntile_from_rank,
    )
    from kafka_streams_common_spark.operators.text import (
        classifier_logit_mills,
    )

    docs = table(spark, sf_dir, "documents")
    scored = classifier_logit_mills(
        docs, extra_cols=((F.col("lang") == "en").alias("pos"),)
    ).select("doc_id", "pos", "logit_mills")
    ranked = global_prefix(
        scored, ["logit_mills", "doc_id"], rank_col="__rank"
    )
    total = scored.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    b = ranked.crossJoin(F.broadcast(total)).select(
        "pos",
        "logit_mills",
        ntile_from_rank(F.col("__rank"), F.col("__n"), 10).alias("bin"),
    )
    return b.groupBy(F.col("bin").cast("bigint").alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum("logit_mills").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1000.0)
        ).alias("mean_logit"),
        (
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("pos_rate"),
    )


@query(
    "text_bm25_search",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    base AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
             CAST(len(list_filter(t, x -> x = 'spark')) AS BIGINT)
               AS tf_spark,
             CAST(len(list_filter(t, x -> x = 'merge')) AS BIGINT)
               AS tf_merge,
             CAST(len(list_filter(t, x -> x = 'window')) AS BIGINT)
               AS tf_window
      FROM toks
    ),
    g AS (
      SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
             sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
             sum(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS df_merge,
             sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
      FROM base
    )
    SELECT doc_id, dl, tf_spark, tf_merge, tf_window,
           ln((CAST(n_docs AS DOUBLE) - CAST(df_spark AS DOUBLE) + 0.5)
              / (CAST(df_spark AS DOUBLE) + 0.5))
             * (CAST(tf_spark AS DOUBLE) * 2.2)
             / (CAST(tf_spark AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
           + ln((CAST(n_docs AS DOUBLE) - CAST(df_merge AS DOUBLE) + 0.5)
              / (CAST(df_merge AS DOUBLE) + 0.5))
             * (CAST(tf_merge AS DOUBLE) * 2.2)
             / (CAST(tf_merge AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
           + ln((CAST(n_docs AS DOUBLE) - CAST(df_window AS DOUBLE) + 0.5)
              / (CAST(df_window AS DOUBLE) + 0.5))
             * (CAST(tf_window AS DOUBLE) * 2.2)
             / (CAST(tf_window AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
           AS score
    FROM base CROSS JOIN g
    WHERE tf_spark > 0 OR tf_merge > 0 OR tf_window > 0
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 full-text ranking (k1 = 1.2, b = 0.75) for the query
    {spark, merge, window}: classic Robertson idf
    ``ln((N − df + ½)/(df + ½))`` × saturating tf with document-length
    normalization — the retrieval scorer under every lexical search and
    RAG hybrid ranker. Scale shape: term frequencies come from
    ``size(filter(tokens, = term))`` — a map-only array fold, NO
    explode and NO posting-list shuffle; corpus statistics (N, Σdl,
    per-term df) are ONE scalar aggregate broadcast back; scoring is a
    scan-level expression and the top-20 is TakeOrderedAndProject.
    Per-document scores are a FIXED three-term expression (not a
    row-order float sum), so doubles match the oracle bit-for-bit;
    zero-tf terms contribute exactly 0.0."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    terms = ("spark", "merge", "window")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))

    def tf_col(trm: str) -> F.Column:
        # closure (not a default arg) — a 2-arg lambda would be read by
        # PySpark as the (element, index) higher-order-function form
        return (
            F.size(F.filter("t", lambda x: x == F.lit(trm)))
            .cast("bigint")
            .alias(f"tf_{trm}")
        )

    base = toks.select(
        "doc_id",
        F.size("t").cast("bigint").alias("dl"),
        *[tf_col(trm) for trm in terms],
    )
    g = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{trm}") > 0, 1).otherwise(0)).alias(
                f"df_{trm}"
            )
            for trm in terms
        ],
    )

    def contrib(trm: str) -> F.Column:
        tf = F.col(f"tf_{trm}").cast("double")
        df = F.col(f"df_{trm}").cast("double")
        n = F.col("n_docs").cast("double")
        avgdl = F.col("sum_dl").cast("double") / n
        idf = F.log((n - df + 0.5) / (df + 0.5))
        return (
            idf
            * (tf * 2.2)
            / (tf + 1.2 * (0.25 + 0.75 * F.col("dl").cast("double") / avgdl))
        )

    return (
        base.crossJoin(F.broadcast(g))
        .filter(
            (F.col("tf_spark") > 0)
            | (F.col("tf_merge") > 0)
            | (F.col("tf_window") > 0)
        )
        .select(
            "doc_id",
            "dl",
            "tf_spark",
            "tf_merge",
            "tf_window",
            (contrib("spark") + contrib("merge") + contrib("window")).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


@query(
    "eval_pr_curve",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS pos, string_split(text, ' ') AS t
      FROM documents
    ),
    s AS (
      SELECT pos,
             CAST(list_sum(list_transform(t,
               x -> ('0x' || substr(md5('w1|' || x), 1, 15))::BIGINT % 2001
                    - 1000)) AS BIGINT) AS mills
      FROM toks
    ),
    h AS (
      SELECT mills,
             sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np_s,
             sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn_s
      FROM s GROUP BY mills
    ),
    t AS (SELECT sum(np_s) AS np, sum(nn_s) AS nn FROM h),
    c AS (
      SELECT mills,
             sum(np_s) OVER (ORDER BY mills DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             sum(nn_s) OVER (ORDER BY mills DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
      FROM h
    )
    SELECT c.mills AS threshold_mills,
           CAST(c.tp AS BIGINT) AS tp, CAST(c.fp AS BIGINT) AS fp,
           CAST(t.np - c.tp AS BIGINT) AS fn,
           CASE WHEN c.tp + c.fp > 0 THEN
             CAST(c.tp AS DOUBLE) / CAST(c.tp + c.fp AS DOUBLE)
           ELSE NULL END AS precision_,
           CASE WHEN t.np > 0 THEN
             CAST(c.tp AS DOUBLE) / CAST(t.np AS DOUBLE)
           ELSE NULL END AS recall_
    FROM c CROSS JOIN t
    """,
)
def eval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL precision-recall curve of the classifier vs the weak label:
    one row per DISTINCT score (threshold = "predict positive at
    mills ≥ t"), with exact tp/fp/fn from cumulative histogram counts —
    the curve behind threshold selection, where the single-operating-
    point row (``eval_confusion_threshold``) and the threshold-free
    AUC only summarize. Scale shape: the corpus collapses to the score
    HISTOGRAM (value-bounded) in one map-only fold + one aggregation;
    the descending cumulative pass runs through the distributed
    bucketed prefix (``operators/prefix.py`` over negated mills — same
    construction, no single-partition sort); totals are one broadcast
    scalar; every metric is a guarded single DOUBLE division of exact
    BIGINTs."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.prefix import global_prefix
    from kafka_streams_common_spark.operators.text import (
        classifier_logit_mills,
    )

    docs = table(spark, sf_dir, "documents")
    scored = classifier_logit_mills(
        docs, extra_cols=((F.col("lang") == "en").alias("pos"),)
    )
    h = scored.groupBy(F.col("logit_mills").alias("mills")).agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np_s"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("nn_s"),
    )
    t = h.agg(F.sum("np_s").alias("np"), F.sum("nn_s").alias("nn"))
    # descending cumulative = ascending prefix over the NEGATED score
    c = (
        global_prefix(
            h.withColumn("neg_mills", -F.col("mills")),
            ["neg_mills"],
            sum_cols=["np_s", "nn_s"],
        )
        .select(
            "mills",
            F.col("run_np_s").alias("tp"),
            F.col("run_nn_s").alias("fp"),
        )
    )
    return c.crossJoin(F.broadcast(t)).select(
        F.col("mills").alias("threshold_mills"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        (F.col("np") - F.col("tp")).cast("bigint").alias("fn"),
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double"),
        ).alias("precision_"),
        F.when(
            F.col("np") > 0,
            F.col("tp").cast("double") / F.col("np").cast("double"),
        ).alias("recall_"),
    )


@query(
    "eval_confusion_threshold",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS pos, string_split(text, ' ') AS t
      FROM documents
    ),
    s AS (
      SELECT pos,
             CAST(list_sum(list_transform(t,
               x -> ('0x' || substr(md5('w1|' || x), 1, 15))::BIGINT % 2001
                    - 1000)) AS BIGINT) > 0 AS pred
      FROM toks
    ),
    c AS (
      SELECT
        sum(CASE WHEN pred AND pos THEN 1 ELSE 0 END) AS tp,
        sum(CASE WHEN pred AND NOT pos THEN 1 ELSE 0 END) AS fp,
        sum(CASE WHEN NOT pred AND pos THEN 1 ELSE 0 END) AS fn,
        sum(CASE WHEN NOT pred AND NOT pos THEN 1 ELSE 0 END) AS tn
      FROM s
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CASE WHEN tp + fp > 0 THEN
             CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
           ELSE NULL END AS precision_,
           CASE WHEN tp + fn > 0 THEN
             CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
           ELSE NULL END AS recall_,
           CASE WHEN 2 * tp + fp + fn > 0 THEN
             CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
           ELSE NULL END AS f1
    FROM c
    """,
)
def eval_confusion_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1 of the classifier GATE
    (logit > 0) against the weak label — the operating-point readout
    that pairs with the threshold-free AUC: counts are exact BIGINTs
    from one map-only fold + one scalar aggregate (no shuffle of the
    corpus), each metric a guarded single DOUBLE division (empty
    denominators → NULL identically on both engines). F1 uses the
    2tp/(2tp+fp+fn) form — one division, no compounding."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.text import (
        classifier_logit_mills,
    )

    docs = table(spark, sf_dir, "documents")
    s = classifier_logit_mills(
        docs, extra_cols=((F.col("lang") == "en").alias("pos"),)
    ).select((F.col("logit_mills") > 0).alias("pred"), "pos")
    c = s.agg(
        F.sum(F.when(F.col("pred") & F.col("pos"), 1).otherwise(0)).alias(
            "tp"
        ),
        F.sum(F.when(F.col("pred") & ~F.col("pos"), 1).otherwise(0)).alias(
            "fp"
        ),
        F.sum(F.when(~F.col("pred") & F.col("pos"), 1).otherwise(0)).alias(
            "fn"
        ),
        F.sum(F.when(~F.col("pred") & ~F.col("pos"), 1).otherwise(0)).alias(
            "tn"
        ),
    )
    return c.select(
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        F.col("tn").cast("bigint").alias("tn"),
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double"),
        ).alias("precision_"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fn")).cast("double"),
        ).alias("recall_"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
        ).alias("f1"),
    )


@query(
    "eval_score_length_spearman",
    oracle="""
    WITH toks AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS t FROM documents
    ),
    s AS (
      SELECT doc_id, n_chars,
             CAST(list_sum(list_transform(t,
               x -> ('0x' || substr(md5('w1|' || x), 1, 15))::BIGINT % 2001
                    - 1000)) AS BIGINT) AS mills
      FROM toks
    ),
    ha_ AS (SELECT mills AS v, count(*) AS cnt FROM s GROUP BY mills),
    ha AS (
      SELECT v, cnt,
             2 * coalesce(sum(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cnt + 1 AS r2
      FROM ha_
    ),
    hb_ AS (SELECT n_chars AS v, count(*) AS cnt FROM s GROUP BY n_chars),
    hb AS (
      SELECT v, cnt,
             2 * coalesce(sum(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cnt + 1 AS r2
      FROM hb_
    ),
    ranked AS (
      SELECT ha.r2 AS ra, hb.r2 AS rb
      FROM s JOIN ha ON s.mills = ha.v JOIN hb ON s.n_chars = hb.v
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(ra) AS DOUBLE) AS sa, CAST(sum(rb) AS DOUBLE) AS sb,
             CAST(sum(ra * ra) AS DOUBLE) AS saa,
             CAST(sum(rb * rb) AS DOUBLE) AS sbb,
             CAST(sum(ra * rb) AS DOUBLE) AS sab,
             count(*) AS n_exact
      FROM ranked
    )
    SELECT CAST(n_exact AS BIGINT) AS n_docs,
           CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0 THEN
             (n * sab - sa * sb)
             / (sqrt(n * saa - sa * sa) * sqrt(n * sbb - sb * sb))
           ELSE NULL END AS spearman_rho
    FROM m
    """,
)
def eval_score_length_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the classifier logit and raw
    document length — the confound check every learned quality gate
    needs (a score that mostly ranks by LENGTH filters nothing length
    stats wouldn't): Pearson on tie-averaged ranks, with ranks DOUBLED
    so tie averaging stays integer (2·avg_rank = 2·count_below + cnt +
    1), making tie handling integer-exact; moments accumulate in DECIMAL
    (sum(ra²) ~ 4n³/3 overflows BIGINT at ~5×10⁴ docs) and ρ is one
    guarded DOUBLE expression over their exact sums. Ranks come from
    the two VALUE HISTOGRAMS (cumulative counts over distinct scores /
    lengths — the AUC posture: bounded by value range, not corpus
    size), each accumulated through the bucketed distributed prefix
    (``operators/prefix.py``) and joined back map-side; no
    single-partition window anywhere."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.prefix import global_prefix
    from kafka_streams_common_spark.operators.text import (
        classifier_logit_mills,
    )

    docs = table(spark, sf_dir, "documents")
    # materialize the scored projection ONCE: it feeds three consumers
    # (both rank histograms + the join-back), and the classifier fold is
    # a full corpus scan — without this it re-runs per consumer. The
    # table is two scalars per document (the mills/length pair), the
    # same persist-the-signature-layer discipline as the LSH operators.
    s = classifier_logit_mills(
        docs, extra_cols=(F.col("n_chars"),)
    ).select("logit_mills", "n_chars").localCheckpoint(eager=True)

    def ranks(col: str):
        h = s.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        # 2·avg_rank = 2·count_below + cnt + 1 = 2·run_cnt − cnt + 1
        return global_prefix(h, ["v"], sum_cols=["cnt"]).select(
            "v",
            (2 * F.col("run_cnt") - F.col("cnt") + 1).alias("r2"),
        )
    ha = ranks("logit_mills").withColumnsRenamed({"v": "va", "r2": "ra"})
    hb = ranks("n_chars").withColumnsRenamed({"v": "vb", "r2": "rb"})
    ranked = (
        s.join(F.broadcast(ha), s.logit_mills == ha.va)
        .join(F.broadcast(hb), s.n_chars == hb.vb)
        .select("ra", "rb")
    )
    # moments accumulate in DECIMAL (order-free, exact far past int64 —
    # doubled ranks make sum(ra*ra) ~ 4n^3/3, which overflows BIGINT at
    # ~5x10^4 docs) and convert to DOUBLE once; the rho formula then
    # runs in double with the identical expression shape on both engines
    d = lambda c: c.cast("decimal(18,0)")  # noqa: E731
    m = ranked.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d(F.col("ra"))).cast("double").alias("sa"),
        F.sum(d(F.col("rb"))).cast("double").alias("sb"),
        F.sum(d(F.col("ra")) * d(F.col("ra"))).cast("double").alias("saa"),
        F.sum(d(F.col("rb")) * d(F.col("rb"))).cast("double").alias("sbb"),
        F.sum(d(F.col("ra")) * d(F.col("rb"))).cast("double").alias("sab"),
    )
    va = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    vb = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    return m.select(
        F.col("n_exact").cast("bigint").alias("n_docs"),
        F.when(
            (va > 0) & (vb > 0),
            (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb"))
            / (F.sqrt(va) * F.sqrt(vb)),
        ).alias("spearman_rho"),
    )


@query(
    "text_encoding_census",
    oracle="""
    SELECT doc_id,
           (['utf8','double_utf8','cp1252','latin1'])
           [CAST(doc_id % 4 AS INT) + 1] AS encoding,
           CAST(strlen(text) + CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN 6 WHEN 1 THEN 8 WHEN 2 THEN 7
                ELSE 5 END AS BIGINT) AS n_bytes,
           md5(text || CASE WHEN doc_id % 4 = 2
                            THEN ' “café”' ELSE ' café' END) AS repaired_md5
    FROM documents
    """,
)
def text_encoding_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-encoding census + repair (r14) — the ingest scrub a
    web-scraped corpus needs before any text operator can trust its
    bytes: a raw-bytes lake is derived with a PLANTED encoding per
    ``doc_id % 4`` (clean UTF-8 / double-encoded UTF-8 mojibake /
    Windows-1252 smart quotes / ISO-8859-1 — each document's text plus
    a non-ASCII suffix so the classes are actually distinguishable),
    then ``operators/encoding.encoding_census`` classifies every
    payload with the standard detection ladder (UTF-8 validity →
    ``Ã``-bigram mojibake signature → C1-byte cp1252-vs-latin1 split)
    and REPAIRS it back to text. The class column gates the detector
    and ``repaired_md5`` gates the inverse transform end to end — the
    oracle's ``md5(text || suffix)`` only matches if the double-encode
    round trip / cp1252 table / latin-1 map were each inverted
    correctly; the per-class ``n_bytes`` offsets (6/8/7/5) pin the
    planted byte layout itself. Map-only Arrow stages."""
    from kafka_streams_common_spark.operators.encoding import (
        encoding_census,
        plant_encoding_lake,
    )

    docs = table(spark, sf_dir, "documents")
    return encoding_census(plant_encoding_lake(docs))
