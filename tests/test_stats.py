from __future__ import annotations

import math

from data_frame_spark.frame import Frame
from data_frame_spark.operators import stats as S
from data_frame_spark.operators import histogram as H


def test_weighted_mean_trapezoidal(spark):
    # reference shape (statistics.rkt:43-54): cumulative timer weight,
    # midpoint samples. timer pauses (dx=0 rows) are skipped.
    fr = Frame.from_dict(
        spark,
        {
            "timer": [0.0, 10.0, 20.0, 20.0, 40.0],
            "spd": [1.0, 2.0, 3.0, 9.0, 9.0],
        },
    )
    out = S.weighted_stats(fr.df, "spd", "timer", order_by=["timer", "spd"]).collect()[0]
    # pairs: (10,1.5) (10,2.5) [skip dx=0 pair] (20,9.0)
    expect = (10 * 1.5 + 10 * 2.5 + 20 * 9.0) / 40.0
    assert abs(out["weighted_mean"] - expect) < 1e-9
    assert abs(out["total_weight"] - 40.0) < 1e-9


def test_unweighted_stats(spark):
    fr = Frame.from_dict(spark, {"v": [1.0, 2.0, 3.0, 4.0, None]})
    out = S.unweighted_stats(fr.df, "v").collect()[0]
    assert out["count"] == 4 and out["mean"] == 2.5
    assert abs(out["stddev"] - math.sqrt(5 / 3)) < 1e-6


def test_quantiles_empirical_inverse_cdf(spark):
    fr = Frame.from_dict(spark, {"v": [float(i) for i in range(1, 11)]})
    out = {r["p"]: r["quantile"] for r in S.quantiles(fr.df, "v").collect()}
    # index = max(ceil(p*10)-1, 0)
    assert out[0.0] == 1.0
    assert out[0.25] == 3.0
    assert out[0.5] == 5.0
    assert out[0.75] == 8.0
    assert out[1.0] == 10.0


def test_weighted_quantiles(spark):
    # cumulative weights 1,2,3,4 -> per-row weight 1 each (first row raw)
    fr = Frame.from_dict(
        spark, {"cw": [1.0, 2.0, 3.0, 4.0], "v": [10.0, 20.0, 30.0, 40.0]}
    )
    out = {
        r["p"]: r["quantile"]
        for r in S.weighted_quantiles(
            fr.df, "v", "cw", order_by=["cw"], probs=[0.0, 0.5, 1.0]
        ).collect()
    }
    assert out[0.0] == 10.0  # cw>=0: first value
    assert out[0.5] == 20.0  # cum 2 of 4 reaches 0.5
    assert out[1.0] == 40.0


def test_histogram_buckets_and_gap_fill(spark):
    fr = Frame.from_dict(spark, {"v": [0.5, 1.5, 1.6, 5.2, -1.2]})
    rows = {r["bucket"]: r["count"] for r in H.histogram(fr.df, "v", width=1.0).collect()}
    # trunc toward zero: -1.2 -> -1, 0.5 -> 0, 1.5/1.6 -> 1, 5.2 -> 5
    assert rows[-1] == 1 and rows[0] == 1 and rows[1] == 2 and rows[5] == 1
    assert rows[2] == 0 and rows[3] == 0 and rows[4] == 0  # gap-filled
    # include_zeroes=False drops samples whose BUCKET is 0 at binning
    # (histogram.rkt:60-77); gap-fill is unconditional, so bucket 0
    # reappears with count 0
    no_zero = {
        r["bucket"]: r["count"]
        for r in H.histogram(fr.df, "v", width=1.0, include_zeroes=False).collect()
    }
    assert no_zero[0] == 0 and no_zero[2] == 0 and len(no_zero) == 7
    assert sum(no_zero.values()) == 4  # the 0.5 sample is gone
    # mass conservation (df-test.rkt:1390-1418): total == row count
    assert sum(rows.values()) == 5


def test_histogram_percentage_and_trim(spark):
    fr = Frame.from_dict(spark, {"v": [0.0] * 1 + [1.0] * 97 + [2.0] * 1 + [3.0] * 1})
    pct = {r["bucket"]: r["count"] for r in H.histogram(fr.df, "v", as_percentage=True).collect()}
    assert abs(sum(pct.values()) - 100.0) < 1e-9
    trimmed = H.histogram(fr.df, "v", trim_outliers=0.02).collect()
    assert [r["bucket"] for r in trimmed] == [1]


def test_string_histogram(spark):
    fr = Frame.from_dict(spark, {"s": ["a", "b", "a", "c", "a"]})
    rows = {r["bucket"]: r["count"] for r in H.string_histogram(fr.df, "s").collect()}
    assert rows == {"a": 3, "b": 1, "c": 1}


def test_combine_and_normalize(spark):
    f1 = Frame.from_dict(spark, {"v": [0.5, 1.5]})
    f2 = Frame.from_dict(spark, {"v": [1.5, 2.5]})
    h1 = H.histogram(f1.df, "v", include_zeroes=False)
    h2 = H.histogram(f2.df, "v", include_zeroes=False)
    # include_zeroes=False discards the 0.5 sample (bucket 0) from f1
    c = {r["bucket"]: (r["count_1"], r["count_2"]) for r in H.combine_histograms(h1, h2).collect()}
    assert c == {1: (1, 1), 2: (0, 1)}
    n = {r["bucket"]: r["count"] for r in H.normalize_histogram(h1).collect()}
    assert abs(sum(n.values()) - 1.0) < 1e-12


def test_trim_no_bucket_qualifies_returns_unchanged(spark):
    # trim-histogram-outliers: strict >, and when NO bucket exceeds the
    # threshold the histogram is returned unchanged (histogram.rkt:142-155)
    fr = Frame.from_dict(spark, {"v": [0.0, 1.0, 2.0, 3.0]})
    out = H.histogram(fr.df, "v", trim_outliers=0.5).collect()
    assert sorted(r["bucket"] for r in out) == [0, 1, 2, 3]
    # exactly-at-threshold share (0.25) is NOT kept under strict >
    out2 = H.histogram(fr.df, "v", trim_outliers=0.25).collect()
    assert sorted(r["bucket"] for r in out2) == [0, 1, 2, 3]


def test_trim_percentage_not_rescaled(spark):
    # percentage is computed over the FULL total before trimming and is
    # not rescaled afterwards (histogram.rkt:198-203)
    fr = Frame.from_dict(spark, {"v": [0.0] * 1 + [1.0] * 97 + [2.0] * 1 + [3.0] * 1})
    out = {r["bucket"]: r["count"] for r in H.histogram(
        fr.df, "v", as_percentage=True, trim_outliers=0.02).collect()}
    assert list(out) == [1] and abs(out[1] - 97.0) < 1e-9


def test_quantile_buckets_hand_computed(spark):
    from data_frame_spark.operators.stats import quantile_buckets

    # values 1..8: quartile thresholds (ceil(p*8) ranks) = 2, 4, 6
    df = spark.createDataFrame([(float(i),) for i in range(1, 9)], "v double")
    got = {r["v"]: r["bucket"] for r in quantile_buckets(df, "v").collect()}
    assert got == {1.0: 1, 2.0: 1, 3.0: 2, 4.0: 2, 5.0: 3, 6.0: 3, 7.0: 4, 8.0: 4}


def test_quantile_buckets_nulls_and_ties(spark):
    from data_frame_spark.operators.stats import quantile_buckets

    df = spark.createDataFrame(
        [(1.0,), (1.0,), (1.0,), (9.0,), (None,)], "v double"
    )
    got = [r["bucket"] for r in quantile_buckets(df, "v").collect()]
    assert got.count(None) == 1          # NULL value -> NULL bucket
    assert set(b for b in got if b) <= {1, 2, 3, 4}
    # all tied values land in one bucket
    tied = {r["bucket"] for r in quantile_buckets(df, "v").collect()
            if r["v"] == 1.0}
    assert len(tied) == 1


def test_quantile_buckets_rejects_unsorted_probs(spark):
    import pytest

    from data_frame_spark.operators.stats import quantile_buckets

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        quantile_buckets(df, "v", probs=(0.5, 0.25))


# ---------------------------------------------------------------------------
# robust outlier stats (median / MAD)
# ---------------------------------------------------------------------------


def test_robust_outliers_matches_direct_median_mad(spark):
    from data_frame_spark.operators.stats import robust_outlier_stats

    # type-1 median: sorted element at rank ceil(n/2)
    vals = [3.0, 1.0, 7.0, 2.0, 9.0, 100.0, 2.5]  # 100.0 is the outlier
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = robust_outlier_stats(df, "v").collect()[0]
    s = sorted(vals)
    med = s[(len(s) + 1) // 2 - 1]  # 2.5... n=7 -> rank 4 -> 3.0
    assert row["med_micro"] == round(med * 1e6)
    devs = sorted(abs(v - med) for v in vals)
    mad = devs[(len(devs) + 1) // 2 - 1]
    assert row["mad_micro"] == round(mad * 1e6)
    assert row["n"] == 7
    assert row["n_outliers"] == 1  # only 100.0 has |z| > 3.5


def test_robust_outliers_zero_mad_group(spark):
    from data_frame_spark.operators.stats import robust_outlier_stats

    # >half the group on one value -> MAD 0 -> no scale, no outliers
    df = spark.createDataFrame(
        [("a", 5.0)] * 6 + [("a", 99.0)] * 2 + [("b", float(i)) for i in range(9)],
        "g string, v double",
    )
    rows = {r["scope"]: r for r in
            robust_outlier_stats(df, "v", group_col="g").collect()}
    assert rows["a"]["mad_micro"] == 0
    assert rows["a"]["n_outliers"] == 0
    assert rows["a"]["max_abs_z_micro"] is None
    assert rows["b"]["mad_micro"] > 0


def test_robust_outliers_no_partitionless_windows(spark, sf_dir):
    from data_frame_spark.plans import checks as C
    from data_frame_spark.queries import QUERIES

    df = QUERIES["robust_outliers_value"](spark, sf_dir)
    assert C.data_sized_partitionless_windows(df) == []


def test_pairwise_corr_matches_numpy(spark):
    import numpy as np

    from data_frame_spark.operators.stats import pairwise_corr

    rng = np.random.RandomState(3)
    x = rng.uniform(0, 100, 3000)
    y = 2.5 * x + rng.uniform(0, 40, 3000)   # strongly correlated
    z = rng.uniform(0, 100, 3000)            # independent
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    got = {(r["col_x"], r["col_y"]): r["corr_micro"] / 1e6
           for r in pairwise_corr(df, ["x", "y", "z"]).collect()}
    # micro-quantization of the inputs perturbs corr by < 1e-4 here
    xq, yq, zq = (np.floor(v * 1e6 + 0.5) for v in (x, y, z))
    assert abs(got[("x", "y")] - np.corrcoef(xq, yq)[0, 1]) < 2e-6
    assert abs(got[("x", "z")] - np.corrcoef(xq, zq)[0, 1]) < 2e-6
    assert got[("x", "y")] > 0.9 and abs(got[("x", "z")]) < 0.1


def test_pairwise_corr_inexact_path_matches_exact(spark):
    # exact=False (built-in F.corr, unbounded scale) must agree with
    # the decimal-exact path to well under micro resolution on data
    # inside the exact path's bound
    import numpy as np

    from data_frame_spark.operators.stats import pairwise_corr

    rng = np.random.RandomState(11)
    x = rng.uniform(0, 1000, 2000)
    y = 0.5 * x + rng.uniform(0, 300, 2000)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    ex = pairwise_corr(df, ["x", "y"], exact=True).collect()[0]
    ap = pairwise_corr(df, ["x", "y"], exact=False).collect()[0]
    assert ex["n"] == ap["n"] == 2000
    # F.corr works on raw doubles (no micro quantization), so allow
    # the quantization-level difference
    assert abs(ex["corr_micro"] - ap["corr_micro"]) <= 2
    from data_frame_spark.plans import checks as C

    assert C.count_shuffles(pairwise_corr(df, ["x", "y"], exact=False)) == 1


def test_pairwise_corr_single_shuffle(spark, sf_dir):
    from data_frame_spark.plans import checks as C
    from data_frame_spark.queries import QUERIES

    df = QUERIES["pairwise_corr_lineitem"](spark, sf_dir)
    assert C.count_shuffles(df) == 1
    assert "partial_sum" in C.simple_plan(df)
    assert C.data_sized_partitionless_windows(df) == []
