"""BPE trainer equivalence vs a pure-Python reference implementation."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from kafka_streams_common_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_merge_table,
    bpe_train,
)
from tests.conftest import SF_SMOKE


def ref_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    """Classic reference BPE (Sennrich et al. 2016 pseudocode): adjacent
    pair census with overlaps, greedy leftmost-first merge application,
    ties on (count desc, left asc, right asc)."""
    wf = Counter(w for t in texts for w in t.split(" "))
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in wf.items():
        key = tuple(list(w) + [END_OF_WORD])
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        new: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        vocab = new
    return merges


def test_bpe_matches_reference_on_randomized_corpora(spark):
    rng = random.Random(5)
    for trial in range(3):
        texts = [
            " ".join(
                "".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(30)
        ]
        docs = spark.createDataFrame([(t,) for t in texts], ["text"])
        got = bpe_train(docs, n_merges=6)
        want = ref_bpe(texts, 6)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_bpe_matches_reference_on_fixture_corpus(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(40)
    texts = [r["text"] for r in docs.select("text").collect()]
    got = bpe_train(docs, n_merges=8)
    want = ref_bpe(texts, 8)
    assert got == want


def test_bpe_merge_table_shape_and_validation(spark):
    docs = spark.createDataFrame(
        [("aa ab aa",), ("ab aa b",)], ["text"]
    )
    tbl = bpe_merge_table(docs, n_merges=4).collect()
    assert [r["merge_rank"] for r in tbl] == list(range(1, len(tbl) + 1))
    assert all(r["pair_count"] >= 1 for r in tbl)
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(docs, 0)


def test_bpe_early_stop_on_fully_merged_vocab(spark):
    # one single-char word: after ('a','</w>') merges there are no pairs
    docs = spark.createDataFrame([("a a a",)], ["text"])
    merges = bpe_train(docs, n_merges=10)
    assert merges == [("a", END_OF_WORD, 3)]


def test_bpe_batched_merges_match_sequential_with_fewer_census_rounds(spark):
    """The batched trainer must return the BIT-identical merge table the
    one-merge-per-census trace produces, while running measurably fewer
    census rounds (the driver round-trip the batching exists to cut)."""
    rng = random.Random(11)
    texts = [
        " ".join(
            "".join(rng.choice("abcdef") for _ in range(rng.randint(2, 7)))
            for _ in range(rng.randint(5, 15))
        )
        for _ in range(60)
    ]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    seq_stats: dict = {}
    bat_stats: dict = {}
    seq = bpe_train(docs, n_merges=12, batch=1, _stats=seq_stats)
    bat = bpe_train(docs, n_merges=12, batch=8, _stats=bat_stats)
    assert bat == seq == ref_bpe(texts, 12)
    assert seq_stats["census_rounds"] == 12
    assert bat_stats["census_rounds"] < 12, bat_stats


def ref_encode(texts, merges):
    """Greedy leftmost application of the merge table in rank order."""
    out = {}
    for i, t in enumerate(texts):
        toks = []
        for w in t.split(" "):
            sym = list(w) + [END_OF_WORD]
            for left, right, *_ in merges:
                res, j = [], 0
                while j < len(sym):
                    if j + 1 < len(sym) and sym[j] == left and sym[j + 1] == right:
                        res.append(left + right)
                        j += 2
                    else:
                        res.append(sym[j])
                        j += 1
                sym = res
            toks.extend(sym)
        out[i] = toks
    return out


def test_bpe_encode_matches_reference_and_reuses_vocab(spark):
    """bpe_encode (train→apply loop closed): token streams equal the
    greedy-leftmost pure-Python reference on randomized corpora, with
    merges crossing the checkpoint_every materialization boundary."""
    rng = random.Random(23)
    texts = [
        " ".join(
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 10))
        )
        for _ in range(40)
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    merges = bpe_train(docs, n_merges=10)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(
            docs, [(l, r) for l, r, _ in merges], checkpoint_every=4
        ).collect()
    }
    want = ref_encode(texts, merges)
    assert got == want
    # n_tokens column agrees with the stream
    for r in bpe_encode(docs, [(l, r) for l, r, _ in merges]).collect():
        assert r["n_tokens"] == len(r["tokens"])


def test_bpe_batched_tiny_alphabet_collision_stress(spark):
    """Alphabet {a,b} with deep merge tables: repeated-symbol pairs,
    overlapping runs ('aaaa…'), and merge-token string collisions
    (e.g. 'abc' reachable as ab+c and a+bc) are all maximally likely —
    the exact regime _batch_select's guards exist for. Batched must
    stay bit-identical to the pure-Python reference."""
    rng = random.Random(31)
    for trial in range(2):
        texts = [
            " ".join(
                "".join(rng.choice("ab") for _ in range(rng.randint(1, 10)))
                for _ in range(rng.randint(4, 14))
            )
            for _ in range(50)
        ]
        docs = spark.createDataFrame([(t,) for t in texts], ["text"])
        got = bpe_train(docs, n_merges=14, batch=8)
        want = ref_bpe(texts, 14)
        assert got == want, f"trial {trial}"
