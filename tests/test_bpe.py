"""BPE training/encoding vs a pure-Python Sennrich reference (same
contract: overlap-counted pair stats, greedy left-to-right merge,
(count DESC, left ASC, right ASC) tie-break, min_count stop)."""

from __future__ import annotations

import collections
import os
import re

from pyspark.sql import functions as F

from data_frame_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_fit,
    word_counts,
)
from data_frame_spark.operators.text import TOKEN_PATTERN


def _brute_fit(texts, n_merges, min_count=2):
    wc = collections.Counter()
    for t in texts:
        wc.update(re.findall(TOKEN_PATTERN, (t or "").lower()))
    words = {tuple(w) + (END_OF_WORD,): n for w, n in wc.items()}
    merges = []
    for _ in range(n_merges):
        stats = collections.Counter()
        for w, n in words.items():
            for i in range(len(w) - 1):
                stats[(w[i], w[i + 1])] += n
        if not stats:
            break
        (l, r), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((l, r, cnt))
        words = {_merge_word(w, l, r): n for w, n in words.items()}
    return merges


def _merge_word(w, l, r):
    out = [w[0]]
    for s in w[1:]:
        if out[-1] == l and s == r:
            out[-1] = l + r
        else:
            out.append(s)
    return tuple(out)


def _fixture_texts(spark, sf_dir, n=40):
    p = os.path.join(sf_dir, "documents.parquet")
    return [
        r["text"]
        for r in spark.read.parquet(p).orderBy("doc_id").limit(n).collect()
    ]


def test_bpe_fit_matches_sennrich_reference(spark, sf_dir):
    texts = _fixture_texts(spark, sf_dir)
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [
        (r["left"], r["right"], r["pair_n"])
        for r in bpe_fit(df, n_merges=25).orderBy("rank").collect()
    ]
    want = _brute_fit(texts, 25)
    assert len(got) == 25  # real text has >= 25 viable merges
    assert got == want


def test_bpe_fit_is_layout_independent(spark, sf_dir):
    texts = _fixture_texts(spark, sf_dir, n=25)
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    a = [tuple(r) for r in bpe_fit(df, n_merges=12).collect()]
    b = [tuple(r) for r in bpe_fit(df.repartition(7), n_merges=12).collect()]
    assert a == b


def test_bpe_encode_round_trips_and_compresses(spark, sf_dir):
    texts = _fixture_texts(spark, sf_dir, n=30)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = bpe_fit(df, n_merges=20)
    enc = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, merges).collect()}
    assert set(enc) == set(range(len(texts)))
    saw_multichar = False
    for i, t in enumerate(texts):
        words = re.findall(TOKEN_PATTERN, (t or "").lower())
        # lossless: stripping markers reconstructs the word stream
        joined = "".join(enc[i]).replace(END_OF_WORD, "")
        assert joined == "".join(words)
        assert enc[i].count(END_OF_WORD) + sum(
            1 for s in enc[i] if s.endswith(END_OF_WORD) and s != END_OF_WORD
        ) == len(words)
        saw_multichar = saw_multichar or any(
            len(s.replace(END_OF_WORD, "")) > 1 for s in enc[i]
        )
    assert saw_multichar  # the learned merges actually fire


def test_bpe_encode_handles_oov_and_empty(spark):
    train = spark.createDataFrame(
        [("the cat sat on the mat the cat",)], ["text"]
    )
    merges = bpe_fit(train, n_merges=8)
    target = spark.createDataFrame(
        [(1, "the cathedral"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    enc = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(target, merges).collect()}
    assert set(enc) == {1, 2, 3}
    assert enc[2] == [] and enc[3] == []
    # OOV word still segments via learned merges: 'the' is a unit prefix
    assert "".join(enc[1]).startswith("the")


def test_bpe_fit_zero_merges_and_word_counts(spark):
    df = spark.createDataFrame([("aa bb aa",)], ["text"])
    assert bpe_fit(df, n_merges=0).count() == 0
    wc = {r["word"]: r["n"] for r in word_counts(df).collect()}
    assert wc == {"aa": 2, "bb": 1}


def test_bpe_fit_strict_raises_on_early_stop(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("a b",)], ["text"])  # no pair reaches 2
    assert bpe_fit(df, n_merges=3).count() == 0
    with _pytest.raises(ValueError, match="sustains only 0 of 3"):
        bpe_fit(df, n_merges=3, strict=True)
