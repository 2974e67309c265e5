from __future__ import annotations

import random

import pytest

from data_frame_spark.operators import meanmax as MM


def ref_mean_max(data, duration, inverted=False):
    """Literal transcription of get-mean-max (meanmax.rkt:141-189)
    as the oracle for the Spark implementation."""
    deltas = []
    for (x1, y1), (x2, y2) in zip(data, data[1:]):
        dt = x2 - x1
        deltas.append((dt, dt * (y1 + y2) / 2, x1))
    best_total = None
    best_pos = None

    def better(total, best):
        return total < best if inverted else total > best

    running_d, running_t = 0.0, 0.0
    head = 0
    tail = 0
    while tail < len(deltas):
        dt, y, _ = deltas[tail]
        diff = running_d + dt - duration
        if diff < 0:
            running_d += dt
            running_t += y
            tail += 1
        else:
            partial_dt = dt - diff
            partial_y = y * (partial_dt / dt)
            hdt, hy, hs = deltas[head]
            total = running_t + partial_y
            if best_total is None or better(total, best_total):
                best_total, best_pos = total, hs
            running_d -= hdt
            running_t -= hy
            head += 1
    if best_total is None:
        return None
    return best_total / duration, best_pos


@pytest.fixture(scope="module")
def series():
    rng = random.Random(7)
    x, rows = 0.0, []
    for _ in range(300):
        x += rng.uniform(1, 7)  # irregular intervals like real data
        rows.append((x, rng.uniform(0.5, 5.0)))
    return rows


@pytest.mark.parametrize("inverted", [False, True])
def test_mean_max_matches_reference_algorithm(spark, series, inverted):
    durations = [10, 30, 60, 120, 300]
    df = spark.createDataFrame(series, ["x", "y"])
    got = {
        r["duration"]: (r["best_mean"], r["pos"])
        for r in MM.mean_max(df, "y", "x", durations, inverted=inverted).collect()
    }
    for d in durations:
        expect = ref_mean_max(series, d, inverted)
        assert expect is not None
        mean, pos = got[d]
        assert mean == pytest.approx(expect[0], abs=1e-9), f"d={d}"
        assert pos == pytest.approx(expect[1], abs=1e-9), f"d={d}"


def test_mean_max_excludes_impossible_durations(spark, series):
    total_span = series[-1][0] - series[0][0]
    df = spark.createDataFrame(series, ["x", "y"])
    out = MM.mean_max(df, "y", "x", [10, int(total_span) + 100]).collect()
    assert {r["duration"] for r in out} == {10.0}


def test_duration_ladder():
    ds = MM.default_durations()
    assert ds[0] == 10 and ds[-1] <= 300 * 60
    assert all(b > a for a, b in zip(ds, ds[1:]))
    assert set(MM.IMPORTANT_DURATIONS) <= set(ds)
    assert len(ds) < 120  # sparsification holds


def test_mean_max_aux(spark, series):
    # aux series == main series -> aux mean equals best mean
    df = spark.createDataFrame(series, ["x", "y"])
    mm = MM.mean_max(df, "y", "x", [30, 120])
    aux = MM.mean_max_aux(df, mm, "y", "x")
    got = {r["duration"]: r["aux_mean"] for r in aux.collect()}
    best = {r["duration"]: r["best_mean"] for r in mm.collect()}
    for d in best:
        assert got[d] == pytest.approx(best[d], abs=1e-9)


# ---------------------------------------------------------------------------
# Property: distributed single-series mean-max == brute-force reference
# semantics (meanmax.rkt:141-189) on arbitrary series. This pins the
# range-bucketed machinery — bucket-edge lag/running-sum carries,
# next-pointer forward brackets, spine offset cumulation — against a
# driver-side reimplementation with identical arithmetic.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings as hyp_settings, strategies as st


def _brute_mean_max(pts, durations, scale=6, inverted=False):
    pts = sorted(set(pts))
    if len(pts) < 2:
        return {}
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    m = float(10**scale)
    acc, A = 0, [0.0]
    for i in range(1, len(xs)):
        sl = (xs[i] - xs[i - 1]) * (ys[i - 1] + ys[i]) / 2
        import math

        acc += int(math.floor(sl * m + 0.5))
        A.append(acc / m)
    xmax = xs[-1]

    def A_at(k):
        # identical interpolation expression to meanmax._interp_a
        import bisect

        j = bisect.bisect_right(xs, k) - 1
        x0, A0 = xs[j], A[j]
        if j + 1 >= len(xs):
            return A0
        x1, A1 = xs[j + 1], A[j + 1]
        if x1 == x0:
            return A0
        return A0 + (k - x0) / (x1 - x0) * (A1 - A0)

    out = {}
    for d in durations:
        best = None
        for i in range(len(xs) - 1):
            k = xs[i] + d
            if k > xmax:
                continue
            mean = (A_at(k) - A[i]) / d
            if best is None:
                best = (mean, xs[i])
            elif (mean < best[0]) if inverted else (mean > best[0]):
                best = (mean, xs[i])
        if best is not None:
            out[float(d)] = best
    return out


_series = st.lists(
    st.tuples(
        st.floats(min_value=0.0, max_value=500.0, allow_nan=False).map(
            lambda v: round(v, 3)
        ),
        st.floats(min_value=-50.0, max_value=50.0, allow_nan=False).map(
            lambda v: round(v, 3)
        ),
    ),
    min_size=2,
    max_size=60,
    unique_by=lambda p: p[0],
)


@given(_series, st.booleans())
@hyp_settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_global_mean_max_matches_bruteforce(spark, pts, inverted):
    durations = [7, 31, 110]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {
        r["duration"]: (r["best_mean"], r["pos"])
        for r in MM.mean_max(
            df, "y", "x", durations, inverted=inverted, slice_scale=6
        ).collect()
    }
    want = _brute_mean_max(pts, durations, inverted=inverted)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == pytest.approx(want[d][0], rel=1e-9, abs=1e-9)
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-12)


@given(_series)
@hyp_settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_both_facets_equal_two_separate_runs(spark, pts):
    # the shared-pipeline faceted path (inverted_durations=) must be
    # bit-identical to running the normal and inverted pipelines
    # separately — pins the round-9 one-aggregate explode rewrite
    durations = [7, 31, 110]
    inv = [31, 110]
    df = spark.createDataFrame(pts, ["x", "y"])
    both = MM.mean_max(
        df, "y", "x", durations, slice_scale=6, inverted_durations=inv
    ).collect()
    normal = {
        r["duration"]: (r["best_mean"], r["pos"])
        for r in MM.mean_max(df, "y", "x", durations, slice_scale=6).collect()
    }
    inverted = {
        r["duration"]: (r["best_mean"], r["pos"])
        for r in MM.mean_max(
            df, "y", "x", inv, inverted=True, slice_scale=6
        ).collect()
    }
    got_n = {r["duration"]: (r["best_mean"], r["pos"]) for r in both if not r["inverted"]}
    got_i = {r["duration"]: (r["best_mean"], r["pos"]) for r in both if r["inverted"]}
    assert got_n == normal
    assert got_i == inverted


def test_both_facets_rejects_unknown_inverted_duration(spark):
    df = spark.createDataFrame([(0.0, 1.0), (10.0, 2.0)], ["x", "y"])
    with pytest.raises(ValueError):
        MM.mean_max(df, "y", "x", [7], inverted_durations=[31])


def test_both_facets_rejects_inverted_flag_conflict(spark):
    df = spark.createDataFrame([(0.0, 1.0), (10.0, 2.0)], ["x", "y"])
    with pytest.raises(ValueError):
        MM.mean_max(df, "y", "x", [7], inverted=True, inverted_durations=[7])
