from __future__ import annotations

from pyspark.sql import functions as F

from data_frame_spark.frame import Frame
from data_frame_spark.operators import core
from data_frame_spark.queries import QUERIES, ORACLE, t


def test_flagship_runs(spark, sf_dir):
    df = QUERIES["pricing_summary"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    total = sum(r["count_order"] for r in rows)
    li_count = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).count()
    assert total == li_count


def test_every_query_has_callable_and_runs_registered():
    for name, fn in QUERIES.items():
        assert callable(fn)
    # every oracle key must have a query
    assert set(ORACLE) <= set(QUERIES)


def test_rotation_list_names_are_live():
    # _FIRST drives the driver's 50-query correctness window; a retired
    # name used to be dropped silently by _order, shifting the window
    # (round-8 regression). queries.py now asserts at import, and this
    # pins the invariant against the assert itself being removed.
    from data_frame_spark import queries as q

    assert set(q._FIRST) <= set(q.QUERIES)
    assert len(q._FIRST) <= 50
    # _FIRST must be duplicate-free, else a slot is wasted
    assert len(q._FIRST) == len(set(q._FIRST))


def test_bench_headline_names_are_live():
    # the bench's fixed comparison subset must never reference a
    # retired query — a silently shrunk subset fakes a speedup in the
    # round-over-round headline_subset_total
    import bench

    assert set(bench.HEADLINE) <= set(bench.Q.QUERIES)
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_round6_matches_duckdb_round_semantics():
    # fit coefficients are rounded to 6 decimals on BOTH sides of the
    # oracle compare; Python round() is banker's (half-to-even) while
    # DuckDB ROUND is half-away-from-zero — _round6 must match DuckDB
    # exactly, ties included (round-9 advisory).
    import duckdb

    from data_frame_spark.queries import _round6

    for v in [0.0000005, 0.0000015, -0.0000025, 1.0000035, -2.7182818,
              3.1415925, 0.0, -0.0000005, 123.4567895]:
        got = duckdb.sql(f"SELECT ROUND(CAST({v!r} AS DOUBLE), 6)").fetchone()[0]
        assert _round6(v) == got, v


def test_frame_wrapper(spark):
    fr = Frame.from_dict(
        spark, {"c0": [1, 2, 3, 4], "c1": [3, 2, 1, 0]}
    ).set_sorted("c0")
    fr = fr.add_derived("csum", lambda a, b: a + b, "c0", "c1")
    assert fr.series_names == ["c0", "c1", "csum"]
    vals = [r["csum"] for r in fr.df.orderBy("c0").collect()]
    assert vals == [4, 4, 4, 4]
    fr2 = fr.rename_series("csum", "total").put_property("name", "demo")
    assert "total" in fr2.series_names and fr2.get_property("name") == "demo"
    assert fr.contains("c0", "c1") and not fr.contains("zz")


def test_count_na_and_drop_na(spark):
    fr = Frame.from_dict(spark, {"a": [1, None, 3, None], "b": [1, 2, None, 4]})
    row = core.count_na(fr.df).collect()[0]
    assert row["na_a"] == 2 and row["na_b"] == 1
    assert core.drop_na(fr.df).count() == 1
    assert core.has_na(fr.df, "a") and core.has_non_na(fr.df, "a")


def test_describe(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_quantity", "l_returnflag")
    d = core.describe(li)
    # output shape pinned to the reference's per-series summary
    # (describe.rkt:29-83): one row per series, in column order, with
    # NA count and the min/max/mean/stddev block
    assert d.columns == [
        "series", "count", "na_count", "min", "max", "mean", "stddev",
    ]
    rows = {r["series"]: r for r in d.collect()}
    assert [r["series"] for r in d.collect()] == ["l_quantity", "l_returnflag"]
    assert rows["l_quantity"]["na_count"] == 0
    assert rows["l_quantity"]["min"] >= 0
    assert rows["l_quantity"]["stddev"] > 0
    assert rows["l_returnflag"]["mean"] is None


def test_frame_parity_shims(spark):
    fr = Frame.from_dict(
        spark, {"c0": [1, 2, 3, 4], "c1": [30, 20, 10, 0]}
    ).set_sorted("c0")
    # shallow copy shares the plan, clones metadata
    cp = fr.shallow_copy().put_property("x", 1)
    assert fr.get_property("x") is None and cp.get_property("x") == 1
    # duplicate series
    assert "c0_bis" in fr.duplicate_series("c0", "c0_bis").series_names
    # point ref over the declared order
    assert fr.ref(2) == (3, 10)
    assert fr.ref(0, "c1") == (30,)
    # iteration incl. reverse (df-test.rkt:1074-1077)
    fwd = [r["c0"] for r in fr.iter_rows()]
    rev = [r["c0"] for r in fr.iter_rows(reverse=True)]
    assert fwd == [1, 2, 3, 4] and rev == [4, 3, 2, 1]


def test_bench_emission_lines_survive_tail_capture(capsys):
    # r14 verdict #5: the one-line per-query dict outgrew the
    # driver's output-tail capture. Pin the fixed shape: every
    # emitted line is short (<1 KB), the per-query parts reassemble
    # to the full timing dict, and the LAST line is the short
    # summary the driver parses.
    import json

    import bench

    timings = {f"query_{i:03d}_with_a_long_name": i / 7.0 for i in range(100)}
    bench.emit_json(timings, 0.1, 2, cpus=32)
    lines = capsys.readouterr().out.strip().splitlines()
    assert all(len(ln) < 1024 for ln in lines)
    parsed = [json.loads(ln) for ln in lines]
    parts = [p for p in parsed if "per_query_part" in p]
    assert len(parts) == parts[0]["parts"]
    merged = {}
    for p in parts:
        assert not set(p["queries"]) & set(merged)  # disjoint
        merged.update(p["queries"])
    assert merged == {k: round(v, 10) for k, v in timings.items()} or merged == timings
    summary = parsed[-1]
    assert summary["metric"] == "headline_queries_total"
    assert summary["n_queries"] == 100 and len(summary["queries"]) == 10
    assert summary["cpus"] == 32
    # r18 VERDICT #1 hardening: the summary ALSO leads the output
    # (head captures), and the part lines carry the slowest queries
    # LAST so a tail capture keeps the top cost centers
    assert parsed[0] == summary
    part_maxes = [max(p["queries"].values()) for p in parts]
    assert part_maxes == sorted(part_maxes)
    assert max(timings.values()) in parts[-1]["queries"].values()


def test_bench_history_filename_keyed_by_sf_and_cpus(tmp_path, monkeypatch):
    # r18 VERDICT #2: the driver's local[8] scaling run overwrote the
    # canonical 32-core latest.json. Pin: only CANONICAL_SF at
    # CANONICAL_CPUS writes latest.json; any other (sf, cpus) combo
    # writes a suffixed sibling.
    import bench

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    cases = [
        ({"sf": 0.1, "cpus": 32}, "latest.json"),
        ({"sf": 0.1, "cpus": 8}, "latest_c8.json"),
        ({"sf": 0.01, "cpus": 32}, "latest_sf0.01.json"),
        ({"sf": 1, "cpus": 8}, "latest_sf1_c8.json"),
    ]
    for summary, expected in cases:
        bench.write_history(
            {"q": 1.0}, {**summary, "value": 1.0, "metric": "m"}
        )
        assert (tmp_path / "docs" / "BENCH_HISTORY" / expected).exists(), expected


def test_no_row_at_a_time_python_udfs_in_package():
    # the 100 TB contract bans row-at-a-time Python from the hot
    # path: every Python lane must be Arrow-batched (pandas_udf /
    # mapInPandas / applyInPandas). Static pin: no F.udf /
    # functions.udf / @udf anywhere in the package source; the
    # plan-level twin is the scale ledger's row-python column
    # (BatchEvalPython nodes), 0 for all registered queries.
    import re
    from pathlib import Path

    import data_frame_spark

    pkg = Path(data_frame_spark.__file__).parent
    # four lanes into a row-at-a-time UDF, all banned: qualified
    # calls (F.udf / functions.udf, with or without decorator
    # parens), bare-name imports (`from pyspark.sql.functions
    # import udf` — the only way a bare udf() call can exist;
    # \budf\b does NOT match pandas_udf, `_` is a word char), and
    # session registration (spark.udf.register). Review-pass fix:
    # the first regex missed the latter three.
    pat = re.compile(
        r"@?(?<![\w.])(F\.udf|functions\.udf)\b"
        r"|from\s+pyspark\.sql\.functions\s+import\s+[^\n]*\budf\b"
        r"|\.udf\.register\s*\("
        r"|^\s*@udf\b",
        re.MULTILINE,
    )
    hits = [
        f"{p.relative_to(pkg)}: {m.group(0)!r}"
        for p in pkg.rglob("*.py")
        for m in [pat.search(p.read_text())]
        if m
    ]
    assert not hits, hits
