"""Deterministic bloom-filter join pruning — the runtime-filter
discipline for 100 TB fact-dim joins, made oracle-checkable.

Spark's own runtime filters (InSubqueryExec / bloom runtime filter,
and the reference's semi-join idiom in SURVEY §2.3) prune a fact scan
against a dim keyset BEFORE the shuffle: at 1000-executor scale the
win is that the fact side never shuffles rows that cannot join. The
engine-internal bloom is not reproducible in SQL, so this module
builds the same structure from the repo's cross-engine hash
(functions/texthash.hash60 — md5 is md5 on both engines):

* k bit positions per key: ``hash60(key, seed=j) % num_bits``
* the bitmap is ``num_bits/63``-many BIGINT words (bits 0..62 only —
  bit 63 stays clear so signed semantics can never differ), each the
  ``bit_or`` of ``1 << (pos % 63)`` — ONE map-combinable aggregate
  over the dim keys, output size fixed by the CONSTRUCTOR constant
  ``num_bits`` regardless of dim cardinality
* the probe is a pure narrow filter: literal word array +
  shiftright/AND bit tests — no join, no shuffle, whole-stage codegen

False positives are the bloom trade (p ≈ (1-e^{-kn/m})^k); callers
that need exactness follow with the real join — the filter only
shrinks what reaches it. ``bloom_prune_counts`` quantifies the trade
per group against the exact semi-join, and the DuckDB twin
(oracle_prep.bloom_prune_oracle_sql) reproduces bitmap AND counts
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_frame_spark.functions.texthash import hash60
from data_frame_spark.operators.colnames import quoted as _qc

#: bits per bitmap word — 63, not 64: bit 63 would be the BIGINT sign
#: bit, and signed >> / << edge semantics are the kind of cross-engine
#: trap the rest of this repo quantizes away. One unused bit per word
#: costs 1.6% space and removes the entire class.
WORD_BITS = 63


def bits_for(n_keys: int, fp: float = 0.01, k: int = 3) -> int:
    """Bitmap size for a target false-positive rate at k hashes —
    the recommended_planes analog (r18: fixed-size filters saturate
    as the keyset grows; size to the data). p ≈ (1-e^{-kn/m})^k
    inverted: m = -k·n / ln(1 - p^{1/k}), rounded up to whole
    63-bit words. The result is the CONSTANT that bounds the build
    aggregate's output and the probe literal — ~1.4 bytes/key at 1%
    with k=3, so even 10^9 dim keys fit a ~1.7 GB broadcast-free
    literal plan only if chunked; past ~10^7 keys prefer the real
    join (the filter's win is pruning the fact SCAN, and a keyset
    that large usually merits a shuffle join anyway)."""
    import math

    if n_keys <= 0:
        raise ValueError("bits_for needs n_keys > 0")
    if not 0.0 < fp < 1.0:
        raise ValueError("bits_for needs 0 < fp < 1")
    if k <= 0:
        raise ValueError("bits_for needs k >= 1")
    m = -k * n_keys / math.log(1.0 - fp ** (1.0 / k))
    words = max(1, math.ceil(m / WORD_BITS))
    return words * WORD_BITS


def _positions(key: Column, num_bits: int, k: int) -> list[Column]:
    """The k bit positions of ``key`` — identical arithmetic to the
    SQL twin (hash60 is always positive, so ``%`` agrees across
    engines without pmod gymnastics)."""
    return [hash60(key, seed=j) % F.lit(num_bits) for j in range(k)]


def _check_params(num_bits: int, k: int) -> None:
    if num_bits <= 0 or num_bits % WORD_BITS != 0:
        raise ValueError(
            f"bloom num_bits must be a positive multiple of {WORD_BITS}"
        )
    if k <= 0:
        raise ValueError("bloom k must be >= 1")


def bloom_build(
    keys: DataFrame, key_col: str, num_bits: int, k: int = 3
) -> list[int]:
    """Aggregate the dim keyset into the bitmap word list.

    ONE map-combinable aggregate: every key explodes to k (word, mask)
    pairs, ``bit_or`` collapses them per word — the shuffle carries at
    most ``num_bits/63`` groups however large the dim side is, and the
    driver collect is bounded by the same constructor constant (the
    scale classifier's bounded-collect class: sketch-sized, not
    data-sized). NULL keys are skipped (they never join anyway).
    Returns ``num_bits/63`` ints, missing words zero-filled."""
    _check_params(num_bits, k)
    key = _qc(key_col)
    pos = F.explode(F.array(*_positions(key, num_bits, k))).alias("__pos")
    words = (
        keys.where(key.isNotNull())
        .select(pos)
        .select(
            (F.col("__pos") / F.lit(WORD_BITS)).cast("long").alias("__w"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(__pos % {WORD_BITS} AS INT))"
            ).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__word"))
        .collect()
    )
    out = [0] * (num_bits // WORD_BITS)
    for r in words:
        out[int(r["__w"])] = int(r["__word"])
    return out


def bloom_might_contain(
    key: Column, words: list[int], num_bits: int, k: int = 3
) -> Column:
    """The probe predicate: TRUE iff every one of the key's k bits is
    set. Pure Column expressions over a LITERAL word array — no join,
    no broadcast exchange, stays inside whole-stage codegen. NULL
    keys probe NULL (filter semantics drop them, matching the join
    they stand in for)."""
    _check_params(num_bits, k)
    if len(words) != num_bits // WORD_BITS:
        raise ValueError(
            f"bloom words length {len(words)} != num_bits/{WORD_BITS}"
        )
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    # dynamic single-bit masks via a literal 2^b lookup + bitwiseAND:
    # all-integer (a double-division bit test would lose low bits of
    # 63-bit words), and the Python shiftright wrapper only takes int
    # literal shift amounts anyway
    pow2 = F.array(*[F.lit(1 << b).cast("long") for b in range(WORD_BITS)])
    cond = None
    for p in _positions(key, num_bits, k):
        word = F.element_at(arr, (p / F.lit(WORD_BITS)).cast("int") + F.lit(1))
        mask = F.element_at(pow2, (p % F.lit(WORD_BITS)).cast("int") + F.lit(1))
        cond_j = word.bitwiseAND(mask) != 0
        cond = cond_j if cond is None else (cond & cond_j)
    return cond


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    words: list[int],
    num_bits: int,
    k: int = 3,
) -> DataFrame:
    """Filter ``fact`` to rows whose key MIGHT be in the keyset the
    bitmap was built from (false positives possible, false negatives
    impossible). The 100 TB shape: a narrow scan filter — rows that
    cannot join never reach the join's shuffle."""
    return fact.where(bloom_might_contain(_qc(key_col), words, num_bits, k))
