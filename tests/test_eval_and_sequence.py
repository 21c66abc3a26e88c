"""Behavior tests (beyond oracle parity) for the session-4 operators:
EWMA recurrence, bounded BFS, AUC histogram identity, TWAP weighting,
BM25 ranking, and quarantine routing consistency."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from kafka_streams_common_spark.operators.cluster import bfs_hops
from kafka_streams_common_spark.operators.timeseries import ewma
from kafka_streams_common_spark.queries.registry import QUERIES
from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# EWMA — grouped Arrow kernel vs a pure-Python sequential reference
# ---------------------------------------------------------------------------

def test_ewma_matches_sequential_reference(spark):
    rng = random.Random(7)
    rows = [
        (key, f"t{i:03d}", rng.randint(0, 1000))
        for key in ("a", "b", "c")
        for i in range(40)
    ]
    rng.shuffle(rows)  # input arrives unsorted; the kernel must sort
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma(df, ["k"], "t", "x", alpha=0.25).collect()
    }
    by_key: dict[str, list] = {}
    for k, t, x in sorted(rows):
        by_key.setdefault(k, []).append((t, x))
    for k, series in by_key.items():
        prev = None
        for t, x in series:
            prev = float(x) if prev is None else 0.25 * x + 0.75 * prev
            assert got[(k, t)] == prev  # bit-exact, not approx

    # single-point series: ewma == the value itself
    one = spark.createDataFrame([("z", "t0", 42)], ["k", "t", "x"])
    assert ewma(one, ["k"], "t", "x").collect()[0]["ewma"] == 42.0


def test_ewma_tiebreak_cols_make_duplicate_timestamps_deterministic(spark):
    """Duplicate order_col values: tiebreak_cols extends the sort to a
    total order, so the fold is reproducible regardless of the row
    order the shuffle delivers."""
    rows = [("k", "t0", i, float(v)) for i, v in enumerate([5, 1, 9, 3])]
    for seed in (0, 1, 2):
        shuffled = list(rows)
        random.Random(seed).shuffle(shuffled)
        df = spark.createDataFrame(
            shuffled, ["k", "t", "seq", "x"]
        ).repartition(4)
        got = [
            r["ewma"]
            for r in ewma(
                df, ["k"], "t", "x", alpha=0.25, tiebreak_cols=["seq"]
            )
            .orderBy("seq")
            .collect()
        ]
        want, prev = [], None
        for _, _, _, x in rows:
            prev = x if prev is None else 0.25 * x + 0.75 * prev
            want.append(prev)
        assert got == want, seed


# ---------------------------------------------------------------------------
# BFS — iterative frontier expansion vs brute-force shortest hops
# ---------------------------------------------------------------------------

def test_bfs_hops_matches_bruteforce(spark):
    # path 0-1-2-3-4 plus a triangle 0-5-6-0 and an unreachable island 8-9
    und = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 0), (8, 9)]
    edges = und + [(b, a) for a, b in und]
    edf = spark.createDataFrame(edges, ["a", "b"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edf, seeds, max_hops=3).collect()
    }
    # brute force BFS
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    want, frontier = {0: 0}, [0]
    for hop in (1, 2, 3):
        frontier = [
            n for cur in frontier for n in adj.get(cur, ())
            if n not in want
        ]
        for n in frontier:
            want.setdefault(n, hop)
    assert got == want
    assert 8 not in got and 9 not in got  # island unreachable
    assert 4 not in got  # path end is 4 hops away — beyond the bound
    assert got[3] == 3 and got[6] == 1  # triangle beats the long way round


# ---------------------------------------------------------------------------
# AUC — histogram formula vs brute-force pairwise comparisons
# ---------------------------------------------------------------------------

def test_auc_histogram_equals_pairwise(spark):
    row = QUERIES["eval_classifier_auc"](spark, SF_SMOKE).collect()[0]
    # brute force: recompute scores + labels, compare all pos/neg pairs
    from kafka_streams_common_spark.operators.text import (
        classifier_logit_mills,
    )
    from kafka_streams_common_spark.queries.registry import table

    docs = table(spark, SF_SMOKE, "documents")
    scored = classifier_logit_mills(
        docs, extra_cols=((F.col("lang") == "en").alias("pos"),)
    ).collect()
    pos = [r["logit_mills"] for r in scored if r["pos"]]
    neg = [r["logit_mills"] for r in scored if not r["pos"]]
    wins = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert math.isclose(
        row["auc"], wins / (len(pos) * len(neg)), rel_tol=0, abs_tol=0
    )


# ---------------------------------------------------------------------------
# TWAP — duration weighting recomputed row-by-row in Python
# ---------------------------------------------------------------------------

def test_twap_matches_python_recompute(spark):
    out = {
        r["day"]: r
        for r in QUERIES["timeseries_twap_value_daily"](
            spark, SF_SMOKE
        ).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("ts", "event_id", "value")
        .collect()
    )
    import collections
    import datetime as dt
    from decimal import Decimal

    per_day = collections.defaultdict(list)
    for r in ev:
        per_day[r["ts"].date()].append(r)
    for day, rows in per_day.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        day_end = dt.datetime.combine(
            day + dt.timedelta(days=1), dt.time()
        )
        num, den = Decimal(0), 0
        for i, r in enumerate(rows):
            nxt = rows[i + 1]["ts"] if i + 1 < len(rows) else day_end
            dur = (nxt - r["ts"]) // dt.timedelta(microseconds=1)
            cents = int(
                Decimal(str(round(r["value"], 2))) * 100
            )
            num += Decimal(cents) * dur
            den += dur
        want = float(num) / float(den) / 100.0
        got = out[day.strftime("%Y-%m-%d")]
        assert got["total_us"] == den
        assert math.isclose(got["twap"], want, rel_tol=1e-12)
        assert got["n_events"] == len(rows)
    assert set(out) == {
        d.strftime("%Y-%m-%d") for d in per_day
    }


# ---------------------------------------------------------------------------
# BM25 — ranking sanity + score recompute for the top hit
# ---------------------------------------------------------------------------

def test_bm25_ranking_and_score(spark):
    res = QUERIES["text_bm25_search"](spark, SF_SMOKE).collect()
    assert 0 < len(res) <= 20
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    for r in res:
        assert r["tf_spark"] + r["tf_merge"] + r["tf_window"] > 0

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    terms = ("spark", "merge", "window")
    df = {
        trm: sum(1 for t in toks.values() if trm in t) for trm in terms
    }

    def score(doc_id: int) -> float:
        t = toks[doc_id]
        s = 0.0
        for trm in terms:
            tf = t.count(trm)
            idf = math.log((n - df[trm] + 0.5) / (df[trm] + 0.5))
            s += idf * (tf * 2.2) / (
                tf + 1.2 * (0.25 + 0.75 * len(t) / avgdl)
            )
        return s

    top = res[0]
    assert math.isclose(top["score"], score(top["doc_id"]), rel_tol=1e-12)
    # the reported top really is the max over docs containing any term
    matching = [
        d for d, t in toks.items()
        if any(trm in t for trm in terms)
    ]
    assert max(score(d) for d in matching) <= top["score"] + 1e-9


# ---------------------------------------------------------------------------
# quarantine — routing census internally consistent
# ---------------------------------------------------------------------------

def test_quarantine_census_consistent(spark):
    rows = {
        r["reason"]: r
        for r in QUERIES["dq_quarantine_bad_records"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(rows) == {
        "bad_props", "k_out_of_range", "value_extreme", "passed",
    }
    n_total = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    for r in rows.values():
        assert 0 <= r["n_records"] <= n_total
        assert math.isclose(r["fraction"], r["n_records"] / n_total)
    # reasons can overlap, but passed + any-flagged partitions the log:
    # passed count == total - |union of flags|; union ≥ max single flag
    flagged_max = max(
        rows[k]["n_records"]
        for k in ("bad_props", "k_out_of_range", "value_extreme")
    )
    assert rows["passed"]["n_records"] <= n_total - flagged_max
    # the fixture should actually exercise the quarantine path
    assert rows["value_extreme"]["n_records"] > 0
    assert rows["k_out_of_range"]["n_records"] > 0
    assert rows["bad_props"]["n_records"] == 0  # clean fixture, by design


# ---------------------------------------------------------------------------
# Spearman — histogram average-ranks vs a direct rank-and-correlate
# ---------------------------------------------------------------------------

def test_spearman_matches_direct_ranks(spark):
    row = QUERIES["eval_score_length_spearman"](spark, SF_SMOKE).collect()[0]
    from kafka_streams_common_spark.operators.text import (
        classifier_logit_mills,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    s = classifier_logit_mills(
        docs, extra_cols=(F.col("n_chars"),)
    ).collect()

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0  # mean of ranks i+1..j
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return ranks

    ra = avg_ranks([r["logit_mills"] for r in s])
    rb = avg_ranks([r["n_chars"] for r in s])
    n = len(s)
    sa, sb = sum(ra), sum(rb)
    saa = sum(x * x for x in ra)
    sbb = sum(x * x for x in rb)
    sab = sum(x * y for x, y in zip(ra, rb))
    want = (n * sab - sa * sb) / (
        math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
    )
    assert row["n_docs"] == n
    assert math.isclose(row["spearman_rho"], want, rel_tol=1e-12)


# ---------------------------------------------------------------------------
# spatial radius join — cell-banded candidates vs all-pairs haversine
# ---------------------------------------------------------------------------

def test_geo_radius_matches_allpairs(spark):
    got = {
        (r["a_custkey"], r["b_custkey"]): r["dist_km"]
        for r in QUERIES["geo_radius_join_customers"](
            spark, SF_SMOKE
        ).collect()
    }
    import hashlib

    def md5i(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    keys = [
        r["c_custkey"]
        for r in spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .select("c_custkey")
        .collect()
    ]
    pts = {
        k: (
            47.0 + (md5i(f"{k}|lat") % 1000000) / 1000000.0,
            8.0 + (md5i(f"{k}|lon") % 1000000) / 1000000.0 * 1.5,
        )
        for k in keys
    }

    def hav(p, q):
        la1, lo1, la2, lo2 = map(math.radians, (*p, *q))
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2.0 * 6371.0 * math.asin(math.sqrt(h))

    want = {}
    ks = sorted(keys)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            d = hav(pts[a], pts[b])
            if d <= 5.0:
                want[(a, b)] = d
    assert set(got) == set(want)  # banding misses nothing within radius
    for k, d in want.items():
        assert math.isclose(got[k], round(d, 6), abs_tol=1e-6)


# ---------------------------------------------------------------------------
# sequence pattern match — regex over ordered symbols vs Python re
# ---------------------------------------------------------------------------

def test_pattern_match_matches_python_re(spark):
    import re

    got = {
        r["user_id"]: (r["n_events"], r["n_matches"], r["matched"])
        for r in QUERIES["events_pattern_match_sequence"](
            spark, SF_SMOKE
        ).collect()
    }
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs: dict = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append(r["event_type"][0])
    pat = re.compile(r"v[^p]*c[^p]*p")
    for u, syms in seqs.items():
        s = "".join(syms)
        n = len(pat.findall(s))
        assert got[u] == (len(syms), n, n > 0)
    assert set(got) == set(seqs)


def test_holt_linear_matches_sequential_reference(spark):
    from kafka_streams_common_spark.operators.timeseries import holt_linear

    rng = random.Random(11)
    rows = [
        (key, f"t{i:03d}", rng.randint(0, 500))
        for key in ("a", "b")
        for i in range(30)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = {
        (r["k"], r["t"]): (r["level"], r["trend"], r["forecast"])
        for r in holt_linear(df, ["k"], "t", "x", alpha=0.5, beta=0.25)
        .collect()
    }
    by_key: dict[str, list] = {}
    for k, t, x in sorted(rows):
        by_key.setdefault(k, []).append((t, x))
    for k, series in by_key.items():
        lv = bv = None
        for i, (t, x) in enumerate(series):
            if i == 0:
                lv, bv = float(x), 0.0
            else:
                prev = lv
                lv = 0.5 * x + 0.5 * (prev + bv)
                bv = 0.25 * (lv - prev) + 0.75 * bv
            assert got[(k, t)] == (lv, bv, lv + bv)  # bit-exact
