"""Property tests for the range-bucketed global-order primitives.

These pin the core claim of operators/distributed.py: bucketed
two-level computation reproduces the sequential global-order result
for ANY data distribution and ANY bucket boundaries (boundaries only
affect balance). Hypothesis drives adversarial shapes: ties, empty
buckets, skew, negatives, single rows.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from data_frame_spark.operators.distributed import (
    bucket_expr,
    with_global_rank,
    with_lag,
    with_running_sum,
)

_vals = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=1,
    max_size=60,
)
_bounds = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    max_size=5,
)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, xs):
    return spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], ["i", "x"]
    )


@given(xs=_vals, bs=_bounds)
@_slow
def test_global_rank_matches_sequential(spark, xs, bs):
    bs = sorted(set(bs))
    out = with_global_rank(_df(spark, xs), ["x", "i"], boundaries=bs).collect()
    got = {r["i"]: r["__rn"] for r in out}
    expect = {
        i: rank + 1
        for rank, (x, i) in enumerate(sorted((x, i) for i, x in enumerate(xs)))
    }
    assert got == expect


@given(xs=_vals)
@_slow
def test_running_sum_matches_sequential(spark, xs):
    ints = [int(x) % 1000 for x in xs]
    df = spark.createDataFrame(
        [(i, float(x), v) for i, (x, v) in enumerate(zip(xs, ints))],
        ["i", "x", "v"],
    )
    out = with_running_sum(df, ["x", "i"], "v", out="__cw", n_buckets=4).collect()
    got = {r["i"]: r["__cw"] for r in out}
    acc, expect = 0, {}
    for x, i in sorted((x, i) for i, x in enumerate(xs)):
        acc += ints[i]
        expect[i] = acc
    assert got == expect


@given(xs=_vals)
@_slow
def test_lag_matches_sequential(spark, xs):
    out = with_lag(_df(spark, xs), ["x", "i"], ["x"], n_buckets=3).collect()
    got = {r["i"]: r["__lag_x"] for r in out}
    order = sorted((x, i) for i, x in enumerate(xs))
    expect = {i: (order[k - 1][0] if k else None) for k, (x, i) in enumerate(order)}
    for i in expect:
        if expect[i] is None:
            assert got[i] is None
        else:
            assert got[i] is not None and math.isclose(got[i], expect[i])


def test_bucket_expr_is_monotonic(spark):
    bs = [-5.0, 0.0, 0.0 + 1e-9, 7.5]
    df = spark.createDataFrame(
        [(float(x),) for x in (-10, -5, -1, 0, 1, 7.5, 99)], ["x"]
    ).withColumn("b", bucket_expr(F.col("x"), bs))
    rows = sorted((r["x"], r["b"]) for r in df.collect())
    buckets = [b for _, b in rows]
    assert buckets == sorted(buckets)  # monotone in x
    assert buckets[0] == 0 and buckets[-1] == len(bs)


@given(xs=_vals)
@_slow
def test_quantiles_match_inverse_cdf(spark, xs):
    """df-quantile property (statistics.rkt:84-118): for each p the
    result is the sorted element at max(ceil(p*n)-1, 0), for ANY
    input distribution."""
    from data_frame_spark.operators.stats import quantiles

    df = spark.createDataFrame([(float(v),) for v in xs], ["v"])
    probs = (0.0, 0.25, 0.5, 0.75, 1.0)
    got = {r["p"]: r["quantile"] for r in quantiles(df, "v", probs).collect()}
    s = sorted(float(v) for v in xs)
    n = len(s)
    for p in probs:
        idx = max(math.ceil(p * n) - 1, 0)
        assert got[p] == s[idx], (p, got[p], s[idx])


@given(
    rows=st.lists(
        st.tuples(
            st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
            st.booleans(),
            st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=60,
    ),
    bs=_bounds,
)
@_slow
def test_prev_marked_matches_sequential(spark, rows, bs):
    # last marked value at-or-before each row in (k, tag) order, for
    # ANY boundaries — exercises within-bucket resolution, the spine
    # carry, and buckets with no marked rows
    from data_frame_spark.operators.distributed import with_prev_marked

    data = [
        (float(k), 0 if m else 1, float(v), i)
        for i, (k, m, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, ["k", "tag", "v", "i"])
    bs_sorted = sorted(set(float(b) for b in bs))
    out = with_prev_marked(
        df, ["k", "tag", "i"], ["v"], mark=F.col("tag") == 0,
        boundaries=bs_sorted,
    )
    got = {r["i"]: (None if r["__pm"] is None else r["__pm"]["v"]) for r in out.collect()}
    seq = sorted(data, key=lambda t: (t[0], t[1], t[3]))
    run, want = None, {}
    for k, tag, v, i in seq:
        if tag == 0:
            run = v
        want[i] = run
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            st.floats(min_value=0.0078125, max_value=10.0, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=40,
    )
)
@_slow
def test_weighted_quantiles_match_bruteforce(spark, rows):
    # cumulative-weight axis: w_i = delta of running weight; the
    # distributed result must equal the sequential inverse-CDF walk
    # with identical integer quantization
    from data_frame_spark.operators.stats import weighted_quantiles

    cum = 0.0
    data = []
    for j, (v, dw) in enumerate(rows):
        cum += dw
        data.append((j, float(v), cum))
    df = spark.createDataFrame(data, ["idx", "val", "wcum"])
    probs = [0.0, 0.3, 0.5, 0.9, 1.0]
    got = {
        r["p"]: r["quantile"]
        for r in weighted_quantiles(df, "val", "wcum", ["idx"], probs).collect()
    }
    # brute force, same quantization
    ws = []
    prev = None
    for j, v, wc in data:
        w = wc if prev is None else wc - prev
        prev = wc
        wq = math.floor(w * 1e6 + 0.5)
        if w > 0 and wq > 0:
            ws.append((v, wq))
    ws.sort()
    W = sum(w for _, w in ws)
    want = {}
    for p in probs:
        t = p * W
        acc = 0
        for v, w in ws:
            pa = acc
            acc += w
            if acc >= t and (pa < t or (t <= 0 and pa <= 0)):
                want[p] = v
                break
    assert set(got) == set(want)
    for p in want:
        assert got[p] == want[p]


def test_width_boundaries_property():
    # property: for any sane (lo, hi, n) the split points are strictly
    # increasing, strictly inside (lo, hi), and never more than n-1 —
    # degenerate ranges (hi <= lo, one bucket, NaN-free) yield []
    from data_frame_spark.operators.distributed import width_boundaries

    finite = st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    )

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(finite, finite, st.integers(min_value=0, max_value=64))
    def check(a, b, n):
        lo, hi = min(a, b), max(a, b)
        out = width_boundaries(lo, hi, n)
        if not (hi > lo) or n <= 1:
            assert out == []
            return
        assert out == sorted(out)
        assert len(set(out)) == len(out)
        assert len(out) <= n - 1
        # strictly inside the range — sub-ULP ranges may skip indices,
        # so no positional alignment is asserted
        assert all(lo < x < hi for x in out)

    check()


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # small domain -> value ties
            st.integers(min_value=1, max_value=4),   # exact integer weights
        ),
        min_size=1,
        max_size=30,
    ),
    picks=st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=1, max_size=3
    ),
)
@_slow
def test_weighted_quantiles_exact_boundary_ties(spark, rows, picks):
    # BOUNDARY semantics (r16/r17 verdict surplus item): probs are
    # CONSTRUCTED so p*W lands exactly on a cumulative-weight
    # boundary, with duplicated values — the crossing predicate's
    # (__cw >= t, prev < t) pair must pick exactly the FIRST value
    # whose cumulation REACHES the target, and the t<=0 special case
    # must return the first positive-weight value. Integer weights
    # make every quantized cumulation exact, so the >= comparison is
    # a true tie, not a float near-miss.
    from data_frame_spark.operators.stats import weighted_quantiles

    data = []
    cum = 0.0
    for j, (v, w) in enumerate(rows):
        cum += float(w)
        data.append((j, float(v), cum))
    df = spark.createDataFrame(data, ["idx", "val", "wcum"])
    ws = sorted((float(v), w * 10**6) for v, w in rows)
    W = sum(w for _, w in ws)
    cums, acc = [], 0
    for _, w in ws:
        acc += w
        cums.append(acc)
    probs = sorted({0.0, 1.0, *(cums[p % len(cums)] / W for p in picks)})
    got = {
        r["p"]: r["quantile"]
        for r in weighted_quantiles(df, "val", "wcum", ["idx"], probs).collect()
    }
    want = {}
    for p in probs:
        t = p * W
        acc = 0
        for v, w in ws:
            pa = acc
            acc += w
            if acc >= t and (pa < t or (t <= 0 and pa <= 0)):
                want[p] = v
                break
    assert got == want
