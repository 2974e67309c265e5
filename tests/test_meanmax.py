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
