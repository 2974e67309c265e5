"""pivot / melt: known values, round-trip, guards, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_frame_spark.operators.reshape import melt, pivot


def test_pivot_known_values_and_stable_schema(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "x", 2), ("a", "y", 10), ("b", "y", 5)],
        "g string, p string, v long",
    )
    # 'z' is in the declared domain but absent from the data -> NULL
    # cell, column still present (stable schema); 'w' appears in no
    # domain and is ignored by construction
    out = pivot(df, ["g"], "p", ["x", "y", "z"], F.sum("v"))
    assert out.columns == ["g", "x", "y", "z"]
    got = {r["g"]: (r["x"], r["y"], r["z"]) for r in out.collect()}
    assert got == {"a": (3, 10, None), "b": (None, 5, None)}


def test_pivot_ignores_out_of_domain_values(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "OTHER", 99)], "g string, p string, v long"
    )
    out = pivot(df, ["g"], "p", ["x"], F.sum("v"))
    got, = out.collect()
    assert (got["g"], got["x"]) == ("a", 1)
    assert "OTHER" not in out.columns


def test_reshape_handles_dotted_names_and_collisions(spark):
    # review-pass fix: pivot values / melt columns containing dots
    # must resolve as LITERAL names (backtick-quoted), not
    # struct-field access; name collisions raise instead of emitting
    # ambiguous duplicate columns
    df = spark.createDataFrame(
        [("a", "v1.5", 1), ("a", "v2.5", 2)], "g string, p string, v long"
    )
    out = pivot(df, ["g"], "p", ["v1.5", "v2.5"], F.sum("v"))
    assert out.columns == ["g", "v1.5", "v2.5"]
    row, = out.collect()
    assert (row["g"], row["v1.5"], row["v2.5"]) == ("a", 1, 2)
    back = melt(out, ["g"], ["v1.5", "v2.5"], "p", "v")
    assert sorted(map(tuple, back.collect())) == [
        ("a", "v1.5", 1), ("a", "v2.5", 2),
    ]
    with pytest.raises(ValueError, match="collide"):
        pivot(df, ["g"], "p", ["g"], F.sum("v"))
    with pytest.raises(ValueError, match="var_name/value_name"):
        melt(out, ["g"], ["v1.5"], "g", "v")
    with pytest.raises(ValueError, match="backtick"):
        pivot(df, ["g"], "p", ["bad`name"], F.sum("v"))
    # r15 ADVICE: a DOTTED PIVOT COLUMN itself (not just dotted
    # values) must resolve as a literal name, not struct access
    dotted = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2)], ["g", "p.col", "v"]
    )
    out2 = pivot(dotted, ["g"], "p.col", ["x", "y"], F.sum("v"))
    row2, = out2.collect()
    assert (row2["g"], row2["x"], row2["y"]) == ("a", 1, 2)
    with pytest.raises(ValueError, match="backtick"):
        pivot(dotted, ["g"], "bad`pivot", ["x"], F.sum("v"))


def test_pivot_guards(spark):
    df = spark.createDataFrame([("a", "x", 1)], "g string, p string, v long")
    with pytest.raises(ValueError, match="group column"):
        pivot(df, [], "p", ["x"], F.sum("v"))
    with pytest.raises(ValueError, match="explicit bounded values"):
        pivot(df, ["g"], "p", [], F.sum("v"))
    with pytest.raises(ValueError, match="distinct"):
        pivot(df, ["g"], "p", ["x", "x"], F.sum("v"))


def test_melt_and_pivot_round_trip(spark):
    df = spark.createDataFrame(
        [(1, 10, 20), (2, 30, 40)], "k long, a long, b long"
    )
    long = melt(df, ["k"], ["a", "b"], "col", "val")
    assert sorted(map(tuple, long.collect())) == [
        (1, "a", 10), (1, "b", 20), (2, "a", 30), (2, "b", 40),
    ]
    back = pivot(long, ["k"], "col", ["a", "b"], F.sum("val"))
    assert sorted(map(tuple, back.collect())) == [(1, 10, 20), (2, 30, 40)]
    with pytest.raises(ValueError, match="value column"):
        melt(df, ["k"], [])


def test_pivot_is_one_combinable_exchange_and_melt_is_narrow(spark):
    from data_frame_spark.plans import checks as C

    df = spark.createDataFrame(
        [("a", "x", 1.0)], "g string, p string, v double"
    )
    wide = pivot(df, ["g"], "p", ["x", "y"], F.sum("v"))
    plan = C.simple_plan(wide)
    # two exchanges by design: the data-sized (group, pivot) cell
    # aggregate, then the domain-bounded pivotfirst assembly — both
    # with map-side partials
    assert C.count_shuffles(wide) == 2
    assert "partial_sum" in plan and "partial_pivotfirst" in plan
    long = melt(df, ["g"], ["v"])
    assert C.count_shuffles(long) == 0
    assert "Expand" in C.simple_plan(long)
