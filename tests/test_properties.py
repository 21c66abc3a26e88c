"""Property-based tests (hypothesis): operators vs brute-force reference
implementations on randomized inputs — the §5 depth the reference never had.

Data volumes stay tiny (Spark job per example is expensive); the value is
randomized STRUCTURE: duplicate timestamps, empty sides, single-token docs,
all-identical keys.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_streams_common_spark.operators.asof import asof_join
from kafka_streams_common_spark.operators.dedup import ngram_jaccard_pairs

BASE = datetime(2024, 1, 1)

_keys = st.integers(min_value=0, max_value=2)
_offsets = st.integers(min_value=0, max_value=50)

lefts = st.lists(st.tuples(_keys, _offsets), min_size=1, max_size=8)
rights = st.lists(st.tuples(_keys, _offsets), min_size=0, max_size=8)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(lefts=lefts, rights=rights)
def test_asof_join_matches_bruteforce(spark_, lefts, rights):
    left_rows = [
        (k, BASE + timedelta(minutes=m), i) for i, (k, m) in enumerate(lefts)
    ]
    # unique (key, time) on the right: asof_join dedups ties internally, the
    # brute force here assumes uniqueness for a well-defined expected value
    seen = set()
    right_rows = []
    for i, (k, m) in enumerate(rights):
        if (k, m) not in seen:
            seen.add((k, m))
            right_rows.append((k, BASE + timedelta(minutes=m), f"v{i}"))

    left = spark_.createDataFrame(left_rows, ["k", "t", "lid"])
    right = spark_.createDataFrame(right_rows, ["k", "t", "v"]) if right_rows else (
        spark_.createDataFrame([], "k bigint, t timestamp, v string")
    )
    out = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t", right_cols=["v"]
        ).collect()
    }

    for lid, (k, m) in enumerate(lefts):
        lt = BASE + timedelta(minutes=m)
        candidates = [(t, v) for (rk, t, v) in right_rows if rk == k and t <= lt]
        expect = max(candidates)[1] if candidates else None
        assert out[lid] == expect, (lid, k, m)


_doc_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=1, max_size=6
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_doc_words, min_size=2, max_size=5))
def test_ngram_jaccard_matches_python_reference(spark_, docs):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark_.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs(df, n=2, tau=0.0).collect()
    }

    def shingles(ws):
        if len(ws) < 2:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)}

    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = shingles(docs[i]), shingles(docs[j])
            inter = len(a & b)
            expect = inter / (len(a) + len(b) - inter)
            if inter:
                assert got[(i, j)] == round(expect, 9), (i, j)
            else:
                assert (i, j) not in got


@pytest.fixture(scope="module")
def spark_(spark):
    return spark


_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon"])
_docs = st.lists(
    st.lists(_words, min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=10,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_texts=_docs, bench_texts=_docs)
def test_decontaminate_removes_all_overlap(spark_, corpus_texts, bench_texts):
    """Post-condition: no surviving document shares any word n-gram with the
    benchmark, and documents with no overlap all survive (brute-force set
    check against the operator's broadcast-join implementation)."""
    from kafka_streams_common_spark.operators.dedup import decontaminate

    n = 2

    def shingles(t: str) -> set:
        toks = t.split(" ")
        if len(toks) < n:
            return {t}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench_sh = set().union(*(shingles(t) for t in bench_texts))
    expected = {
        i for i, t in enumerate(corpus_texts) if not (shingles(t) & bench_sh)
    }

    corpus = spark_.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    bench = spark_.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench_texts)], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in decontaminate(corpus, bench, n=n).collect()}
    assert got == expected


_sentences = st.sampled_from(
    ["alpha beta", "gamma delta", "shared boilerplate line", "epsilon zeta eta"]
)
_line_lists = st.lists(
    st.lists(_sentences, min_size=1, max_size=4), min_size=1, max_size=6
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(line_lists=_line_lists, delimiter=st.sampled_from(["\n", ". "]))
def test_line_dedup_matches_bruteforce(spark_, line_lists, delimiter):
    """line_dedup vs a python reference: lines in >1 distinct doc drop
    everywhere (including all-boilerplate docs → empty clean_text), order
    of surviving lines is preserved, counts conserve. Runs both the default
    newline (C4/RefinedWeb) delimiter and the sentence form the fixture
    query uses; ``"\\n"`` exercises the operator default."""
    from kafka_streams_common_spark.operators.dedup import line_dedup

    texts = [delimiter.join(ls) for ls in line_lists]
    docs = spark_.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    kwargs = {} if delimiter == "\n" else {"delimiter": delimiter}
    got = {
        r["doc_id"]: r
        for r in line_dedup(docs, max_doc_freq=1, **kwargs).collect()
    }

    from collections import Counter

    df_count = Counter()
    for ls in line_lists:
        for line in set(ls):
            df_count[line] += 1
    for i, ls in enumerate(line_lists):
        keep = [l for l in ls if df_count[l] <= 1]
        assert got[i]["clean_text"] == delimiter.join(keep), (i, texts)
        assert got[i]["n_kept"] == len(keep)
        assert got[i]["n_dropped"] == len(ls) - len(keep)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_docs)
def test_bigram_repetition_bruteforce(spark_, texts):
    """top_bigram_frac and n_bigrams match a per-doc brute force, including
    single-token docs (excluded) and all-identical-token docs (frac 1.0)."""
    from collections import Counter

    from kafka_streams_common_spark.operators.text import bigram_repetition

    docs = spark_.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_repetition(docs).collect()}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        if len(toks) < 2:
            assert i not in got
            continue
        bgs = Counter(" ".join(p) for p in zip(toks, toks[1:]))
        total = sum(bgs.values())
        assert got[i]["n_bigrams"] == total
        assert abs(got[i]["top_bigram_frac"] - round(max(bgs.values()) / total, 6)) < 1e-9


def test_r5_operators_invariant_under_partitioning(spark_):
    """The round-5 deterministic operators must produce IDENTICAL results
    at any parallelism — the property the driver hash gate rides on.
    Re-running each over adversarial repartitionings (1 partition,
    coalesced, salted 13-way) must not change a single row."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.similarity import (
        ivf_int8_rerank_topk,
    )
    from kafka_streams_common_spark.operators.text import (
        bigram_logprob,
        gopher_quality,
    )
    from kafka_streams_common_spark.queries.registry import table

    sf = "/root/testdata/sf0.001"
    docs = table(spark_, sf, "documents")
    emb = table(spark_, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    for reshape in (lambda d: d.repartition(1), lambda d: d.repartition(13)):
        assert rows(gopher_quality(docs)) == rows(gopher_quality(reshape(docs)))
        assert rows(bigram_logprob(docs)) == rows(bigram_logprob(reshape(docs)))
        assert rows(
            ivf_int8_rerank_topk(emb, queries, k=5, n_centroids=8, n_probe=2)
        ) == rows(
            ivf_int8_rerank_topk(
                reshape(emb), queries, k=5, n_centroids=8, n_probe=2
            )
        )


_f_users = st.integers(min_value=0, max_value=3)
_f_ts = st.integers(min_value=0, max_value=30)
_f_stage = st.sampled_from(["a", "b", "c"])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(_f_users, _f_stage, _f_ts), min_size=1, max_size=20
    )
)
def test_funnel_matches_python_reference(spark_, events):
    """funnel_conversion vs a direct strict-sequential-min reference on
    randomized logs: duplicate timestamps, stage events before entry,
    users skipping stages, multi-user interleaving. Checks depth AND the
    kept stage timestamps (keep_timestamps=True)."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.funnel import funnel_conversion

    def ref_user(evs):
        t, prev = [], None
        for stage in ("a", "b", "c"):
            if stage == "a":
                cand = [ts for ts, s in evs if s == "a"]
            else:
                cand = [ts for ts, s in evs if s == stage and ts > prev]
            if not cand:
                break
            prev = min(cand)
            t.append(prev)
        return t

    expect = {}
    for u in {e[0] for e in events}:
        t = ref_user([(ts, s) for (uu, s, ts) in events if uu == u])
        if t:
            expect[u] = t

    df = spark_.createDataFrame(
        [(u, s, ts) for (u, s, ts) in events],
        "user_id bigint, event_type string, ts bigint",
    )
    out = {
        r["user_id"]: r
        for r in funnel_conversion(
            df,
            [(n, F.col("event_type") == n) for n in ("a", "b", "c")],
            keep_timestamps=True,
        ).collect()
    }
    assert set(out) == set(expect), (sorted(out), sorted(expect))
    for u, t in expect.items():
        r = out[u]
        assert r["funnel_stage"] == len(t), (u, t, r)
        got_ts = [r["ts_a"], r["ts_b"], r["ts_c"]]
        assert got_ts[: len(t)] == t, (u, t, got_ts)
        assert all(v is None for v in got_ts[len(t):]), (u, t, got_ts)


_chunk_words = st.lists(
    st.integers(min_value=0, max_value=9), min_size=1, max_size=40
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(word_ids=_chunk_words, size=st.integers(2, 8), stride=st.integers(1, 8))
def test_chunk_documents_coverage_and_reconstruction(spark_, word_ids, size, stride):
    """Properties on random docs/geometry: every token covered in order,
    chunk count matches the formula, concatenating stride-prefixes of
    each chunk (plus the last chunk's tail) reconstructs the document."""
    from kafka_streams_common_spark.operators.text import chunk_documents

    stride = min(stride, size)
    text = " ".join(f"w{i}" for i in word_ids)
    toks = text.split(" ")
    docs = spark_.createDataFrame([(0, text)], ["doc_id", "text"])
    out = sorted(
        (r["chunk_id"], r["chunk_text"].split(" "))
        for r in chunk_documents(docs, size, stride).collect()
    )
    n = len(toks)
    import math

    expected_chunks = 1 + max(0, math.ceil((n - size) / stride))
    assert len(out) == expected_chunks
    # each chunk is exactly the expected slice
    for cid, chunk in out:
        start = cid * stride
        assert chunk == toks[start : start + size]
    # reconstruction from stride-prefixes + final tail
    rebuilt = []
    for cid, chunk in out[:-1]:
        rebuilt.extend(chunk[:stride])
    rebuilt.extend(out[-1][1])
    assert rebuilt == toks


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    facts=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 999)), max_size=30),
    buckets=st.integers(1, 16),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_join(spark_, facts, buckets, how):
    from kafka_streams_common_spark.operators.skewjoin import salted_join

    fact_rows = [(fid, k) for fid, (k, _) in enumerate(facts)]
    if not fact_rows:
        fact_rows = [(0, 0)]
    f = spark_.createDataFrame(fact_rows, ["fact_id", "k"])
    d = spark_.createDataFrame([(k, f"a{k}") for k in range(3)], ["k", "attr"])
    got = sorted(
        map(tuple, salted_join(f, d, "k", "fact_id", buckets, how).select(
            "k", "fact_id", "attr").collect())
    )
    want = sorted(map(tuple, f.join(d, "k", how).select("k", "fact_id", "attr").collect()))
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 2), st.one_of(st.none(), st.integers(-50, 50))),
        min_size=1,
        max_size=25,
    )
)
def test_profile_columns_matches_pandas(spark_, vals):
    """profile_columns vs pandas on randomized null patterns."""
    from kafka_streams_common_spark.operators.profile import profile_columns

    rows = [(i, g, None if v is None else float(v)) for i, (g, v) in enumerate(vals)]
    df = spark_.createDataFrame(rows, "id bigint, g bigint, v double")
    out = {r["column"]: r for r in profile_columns(df, ["v"]).collect()}["v"]
    pvals = [r[2] for r in rows if r[2] is not None]
    n = len(rows)
    assert out["n_rows"] == n
    assert out["n_nulls"] == n - len(pvals)
    assert out["n_distinct"] == len(set(pvals))
    if pvals:
        assert out["min_value"] == str(min(pvals))
        assert out["max_value"] == str(max(pvals))
        assert out["mean_value"] == pytest.approx(sum(pvals) / len(pvals))
    else:
        assert out["min_value"] is None and out["mean_value"] is None


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(lefts=lefts, rights=rights, tol=st.integers(0, 30))
def test_asof_forward_with_tolerance_matches_bruteforce(spark_, lefts, rights, tol):
    left_rows = [
        (k, BASE + timedelta(minutes=m), i) for i, (k, m) in enumerate(lefts)
    ]
    seen = set()
    right_rows = []
    for i, (k, m) in enumerate(rights):
        if (k, m) not in seen:
            seen.add((k, m))
            right_rows.append((k, BASE + timedelta(minutes=m), f"v{i}"))

    left = spark_.createDataFrame(left_rows, ["k", "t", "lid"])
    right = (
        spark_.createDataFrame(right_rows, ["k", "t", "v"])
        if right_rows
        else spark_.createDataFrame([], "k bigint, t timestamp, v string")
    )
    from pyspark.sql import functions as F

    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t",
            right_cols=["v"], direction="forward",
            tolerance=F.expr(f"INTERVAL {tol} MINUTES"),
        ).collect()
    }
    for k, t, lid in left_rows:
        cands = [(rt, v) for (rk, rt, v) in right_rows
                 if rk == k and rt >= t and (rt - t) <= timedelta(minutes=tol)]
        want = min(cands)[1] if cands else None
        assert got[lid] == want, (lid, got[lid], want)


_maybe_null_vals = st.lists(
    st.tuples(_keys, _offsets, st.booleans()), min_size=0, max_size=8
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(lefts=lefts, rights=_maybe_null_vals, fwd=st.booleans(),
       tol_min=st.integers(min_value=0, max_value=60))
def test_asof_direction_tolerance_nulls_match_bruteforce(
    spark_, lefts, rights, fwd, tol_min
):
    """The r8 struct-carry as-of against brute force across BOTH
    directions, with tolerance, and with genuinely-NULL carried values
    (the matched row must win even when its value is NULL — per-column
    carry would resurrect older values)."""
    left_rows = [
        (k, BASE + timedelta(minutes=m), i) for i, (k, m) in enumerate(lefts)
    ]
    seen = set()
    right_rows = []
    for i, (k, m, has_v) in enumerate(rights):
        if (k, m) not in seen:
            seen.add((k, m))
            right_rows.append(
                (k, BASE + timedelta(minutes=m), f"v{i}" if has_v else None)
            )
    left = spark_.createDataFrame(left_rows, ["k", "t", "lid"])
    right = (
        spark_.createDataFrame(right_rows, "k bigint, t timestamp, v string")
        if right_rows
        else spark_.createDataFrame([], "k bigint, t timestamp, v string")
    )
    direction = "forward" if fwd else "backward"
    tol = timedelta(minutes=tol_min)
    out = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t",
            right_cols=["v"], direction=direction,
            tolerance=F.expr(f"INTERVAL {tol_min} MINUTES"),
        ).collect()
    }
    for lid, (k, m) in enumerate(lefts):
        lt = BASE + timedelta(minutes=m)
        if fwd:
            cands = [(t, v) for (rk, t, v) in right_rows if rk == k and t >= lt]
            match = min(cands) if cands else None
            ok = match is not None and match[0] - lt <= tol
        else:
            cands = [(t, v) for (rk, t, v) in right_rows if rk == k and t <= lt]
            match = max(cands) if cands else None
            ok = match is not None and lt - match[0] <= tol
        expect = match[1] if ok else None
        assert out[lid] == expect, (lid, k, m, direction, tol_min)


_iv_offsets = st.lists(
    st.integers(min_value=0, max_value=3 * 24 * 60),  # minutes over 3 days
    min_size=1,
    max_size=14,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    offsets=_iv_offsets,
    dur_min=st.one_of(
        st.integers(min_value=1, max_value=600),
        # multi-day durations: intervals that fully COVER interior days,
        # which a start-day + end-day clipping pair would silently skip
        st.integers(min_value=24 * 60, max_value=3 * 24 * 60),
    ),
)
def test_peak_concurrency_matches_bruteforce(spark_, offsets, dur_min):
    """Sweep-line peak concurrency vs point-evaluation brute force:
    concurrency at time t = #{intervals [s, s+d) containing t}; the
    per-day max is attained at an interval start or at the day boundary
    (for intervals carried over midnight). Durations span minutes to
    DAYS, forcing interior-day coverage through the clipping logic;
    duplicate offsets force equal-timestamp edge ordering."""
    from datetime import date
    from kafka_streams_common_spark.operators.rollup import (
        peak_concurrency_by_day,
    )

    starts = [BASE + timedelta(minutes=m) for m in offsets]
    d = timedelta(minutes=dur_min)
    df = spark_.createDataFrame([(s,) for s in starts], "ts timestamp")
    got = {
        r["day"]: r["max_concurrent"]
        for r in peak_concurrency_by_day(
            df, "ts", f"INTERVAL {dur_min} MINUTES"
        ).collect()
    }

    def conc(t):
        return sum(1 for s in starts if s <= t < s + d)

    days = sorted({(s + timedelta(minutes=k)).date()
                   for s in starts
                   for k in range(0, dur_min + 1)})
    expect = {}
    for day in days:
        day_start = datetime(day.year, day.month, day.day)
        day_end = day_start + timedelta(days=1)
        points = [day_start] + [
            s for s in starts if day_start <= s < day_end
        ]
        m = max(conc(t) for t in points)
        if m > 0:
            expect[day] = m
    assert got == expect


_mmr_vecs = st.lists(
    st.tuples(
        st.integers(min_value=-3, max_value=3),
        st.integers(min_value=-3, max_value=3),
        st.integers(min_value=1, max_value=3),
    ),
    min_size=3,
    max_size=10,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vecs=_mmr_vecs)
def test_mmr_matches_python_greedy(spark_, vecs):
    """MMR greedy selection vs an independent pure-Python reference:
    identical picks AND bit-identical scores (both sides reduce to the
    same IEEE multiply/subtract/max over sequentially-folded cosines).
    Vectors include duplicates (score ties → id tiebreak)."""
    import math

    from kafka_streams_common_spark.operators.similarity import (
        mmr_diversified_topk,
    )

    corpus = [(i, [float(a), float(b), float(c)]) for i, (a, b, c) in enumerate(vecs)]
    df = spark_.createDataFrame(corpus, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    k, shortlist = 3, 5
    got = sorted(
        (r["step"], r["vec_id"], r["mmr_score"])
        for r in mmr_diversified_topk(df, queries, k=k, shortlist=shortlist).collect()
    )

    def cos(u, v):
        dot = 0.0
        for x, y in zip(u, v):
            dot = dot + x * y
        nu = 0.0
        for x in u:
            nu = nu + x * x
        nv = 0.0
        for y in v:
            nv = nv + y * y
        return dot / (math.sqrt(nu) * math.sqrt(nv))

    vec = dict(corpus)
    qv = vec[0]
    scored = sorted(
        ((cos(vec[i], qv), i) for i, _ in corpus if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:shortlist]
    qsim = {i: s for s, i in scored}
    cands = sorted(qsim)
    sel, expect = [], []
    for step in range(1, min(k, len(cands)) + 1):
        best = None
        for c in cands:
            if c in sel:
                continue
            pen = max((cos(vec[c], vec[s]) for s in sel), default=0.0)
            sc = 0.7 * qsim[c] - 0.3 * pen
            key = (-sc, c)
            if best is None or key < best[0]:
                best = (key, c, sc)
        sel.append(best[1])
        expect.append((step, best[1], best[2]))
    assert got == sorted(expect)


_ohlc_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2 * 24 * 60),  # minutes, 2 days
        st.sampled_from(["x", "y"]),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_ohlc_rows)
def test_ohlc_argmin_matches_bruteforce(spark_, rows):
    """The declarative min_by/max_by-over-(ts,event_id)-struct OHLC (the
    streaming form) vs a Python brute force on the total order —
    duplicate timestamps force the event_id tiebreak through both."""
    data = [
        (i, BASE + timedelta(minutes=m), t, float(v))
        for i, (m, t, v) in enumerate(rows)
    ]
    df = spark_.createDataFrame(
        data, "event_id long, ts timestamp, event_type string, value double"
    )
    key = F.struct("ts", "event_id")
    got = {
        (r["day"].isoformat(), r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"]
        )
        for r in df.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    expect = {}
    groups: dict[tuple, list] = {}
    for i, ts, t, v in data:
        groups.setdefault((ts.date().isoformat(), t), []).append((ts, i, v))
    for k, g in groups.items():
        g.sort()
        vals = [v for _, _, v in g]
        expect[k] = (g[0][2], max(vals), min(vals), g[-1][2], len(g))
    assert got == expect


# ---------------------------------------------------------------------------
# EWMA grouped kernel vs the sequential definition (randomized structure:
# duplicate values, single-point series, identical keys, shuffled arrival)
# ---------------------------------------------------------------------------

_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # key
        st.integers(min_value=0, max_value=30),  # order position
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_series)
def test_ewma_matches_sequential_fold(spark_, rows):
    from kafka_streams_common_spark.operators.timeseries import ewma

    # unique (key, position): the recurrence needs a total order
    seen: set = set()
    uniq = []
    for k, p, x in rows:
        if (k, p) not in seen:
            seen.add((k, p))
            uniq.append((k, f"p{p:02d}", x))
    df = spark_.createDataFrame(uniq, ["k", "t", "x"])
    got = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma(df, ["k"], "t", "x", alpha=0.25).collect()
    }
    by_key: dict = {}
    for k, t, x in sorted(uniq):
        by_key.setdefault(k, []).append((t, x))
    want = {}
    for k, series in by_key.items():
        prev = None
        for t, x in series:
            prev = float(x) if prev is None else 0.25 * x + 0.75 * prev
            want[(k, t)] = prev
    assert got == want  # bit-exact


# ---------------------------------------------------------------------------
# bounded BFS vs brute force on random sparse digraphs
# ---------------------------------------------------------------------------

_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=1,
    max_size=14,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=_edges, max_hops=st.integers(min_value=1, max_value=3))
def test_bfs_hops_matches_bruteforce_random(spark_, edges, max_hops):
    from kafka_streams_common_spark.operators.cluster import bfs_hops

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        edges = [(0, 1)]
    seed = min(a for a, _ in edges)
    edf = spark_.createDataFrame(edges, ["a", "b"])
    seeds = spark_.createDataFrame([(seed,)], ["node"])
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edf, seeds, max_hops=max_hops).collect()
    }
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    want, frontier = {seed: 0}, [seed]
    for hop in range(1, max_hops + 1):
        frontier = sorted(
            {n for cur in frontier for n in adj.get(cur, ()) if n not in want}
        )
        for n in frontier:
            want[n] = hop
    assert got == want


# ---------------------------------------------------------------------------
# global_prefix vs the single-partition window on randomized structure:
# heavy ties, negative values, tiny inputs, degenerate bucket counts
# ---------------------------------------------------------------------------

_pvals = st.lists(
    st.integers(min_value=-5, max_value=5), min_size=1, max_size=40
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=_pvals, n_buckets=st.sampled_from([1, 3, 7]))
def test_global_prefix_property(spark, vals, n_buckets):
    from pyspark.sql import Window

    from kafka_streams_common_spark.operators.prefix import global_prefix

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(4)
    got = {
        r["id"]: (r["rnk"], r["run_v"])
        for r in global_prefix(
            df, ["v", "id"], sum_cols=["v"], rank_col="rnk",
            n_buckets=n_buckets,
        ).collect()
    }
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: (r["rnk"], r["run_v"])
        for r in df.select(
            "id",
            F.row_number().over(Window.orderBy("v", "id")).alias("rnk"),
            F.sum("v").over(w).alias("run_v"),
        ).collect()
    }
    assert got == want
