"""Deequ-style declarative data-quality verification (operators/dq.py)."""

import pytest
from pyspark.sql import functions as F

from data_frame_spark.operators import dq
from data_frame_spark.plans import checks as C


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        # id, name, age, team
        (1, "a", 30, "x"),
        (2, "b", 200, "x"),      # age out of range
        (3, None, 25, "y"),      # name NULL
        (3, "c", 40, "zz"),      # duplicate id, team outside domain
        (4, "d", None, None),    # NULL age (not a range violation), NULL team
        (None, "e", 10, "x"),    # NULL id
        (None, "f", 20, "x"),    # second NULL id -> NULL keys duplicate
    ]
    return spark.createDataFrame(
        rows, "id int, name string, age int, team string"
    )


@pytest.fixture(scope="module")
def teams(spark):
    return spark.createDataFrame([("x",), ("y",)], "team string")


def _report(df):
    return {r["rule_id"]: r.asDict() for r in df.collect()}


def test_verify_brute_force_counts(spark, people, teams):
    rep = _report(
        dq.verify(
            people,
            [
                ("not_null", "r1", "name"),
                ("not_null", "r2", "id"),
                ("in_range", "r3", "age", 0, 120),
                ("accepted_values", "r4", "team", ["x", "y"]),
                ("unique", "r5", ["id"]),
                ("ref_integrity", "r6", "team", teams, "team"),
            ],
        )
    )
    assert len(rep) == 6
    # hand-counted against the fixture rows
    assert rep["r1"]["n_violations"] == 1 and not rep["r1"]["passed"]
    assert rep["r2"]["n_violations"] == 2
    # age 200 violates; NULL age does NOT (pair with not_null to forbid)
    assert rep["r3"]["n_violations"] == 1
    # 'zz' violates; NULL team is not an accepted_values violation
    assert rep["r4"]["n_violations"] == 1
    # duplicates: id=3 twice (1 surplus) + NULL id twice (NULL keys
    # compare equal, 1 surplus) = 2
    assert rep["r5"]["n_violations"] == 2
    assert rep["r5"]["n_rows"] == 7
    # non-NULL teams: x,x,y,zz,x,x -> only 'zz' unmatched
    assert rep["r6"]["n_violations"] == 1
    assert rep["r6"]["n_rows"] == 6
    # every row-local rule was evaluated over the full frame
    assert rep["r1"]["n_rows"] == rep["r3"]["n_rows"] == 7
    assert all(
        set(v) == {"rule_id", "rule", "column", "n_rows",
                   "n_violations", "passed"}
        for v in rep.values()
    )


def test_verify_all_green_and_vacuous(spark, teams):
    clean = spark.createDataFrame(
        [(1, "x"), (2, "y")], "id int, team string"
    )
    rep = _report(
        dq.verify(
            clean,
            [
                ("not_null", "n", "id"),
                ("unique", "u", ["id"]),
                ("ref_integrity", "f", "team", teams, "team"),
            ],
        )
    )
    assert all(v["passed"] and v["n_violations"] == 0 for v in rep.values())
    empty = clean.where(F.lit(False))
    rep0 = _report(dq.verify(empty, [("not_null", "n", "id"),
                                     ("unique", "u", ["id"])]))
    # vacuous pass on an empty frame, counts well-defined zeros
    assert all(v["passed"] and v["n_rows"] == 0 for v in rep0.values())


def test_verify_guards(spark, people, teams):
    with pytest.raises(ValueError, match="at least one rule"):
        dq.verify(people, [])
    with pytest.raises(ValueError, match="unknown rule form"):
        dq.verify(people, [("no_such", "r1", "id")])
    with pytest.raises(ValueError, match="distinct"):
        dq.verify(people, [("not_null", "r1", "id"),
                           ("not_null", "r1", "name")])
    with pytest.raises(ValueError, match="non-empty explicit value list"):
        dq.verify(people, [("accepted_values", "r1", "team", [])])
    with pytest.raises(ValueError, match="key columns"):
        dq.verify(people, [("unique", "r1", [])])
    with pytest.raises(ValueError, match="collides with report columns"):
        dq.verify(people, [("not_null", "r1", "id")], group_by=["rule_id"])


def test_verify_dotted_names(spark):
    df = spark.createDataFrame([(1, 5)], ["a.b", "v"])
    rep = _report(dq.verify(df, [("not_null", "r1", "a.b"),
                                 ("unique", "r2", ["a.b"])]))
    assert rep["r1"]["passed"] and rep["r2"]["passed"]


def test_verify_by_group_brute_force(spark, people, teams):
    # the per-source corpus-gate form: every rule evaluated
    # independently per group, group columns leading the report
    out = dq.verify(
        people,
        [
            ("not_null", "r1", "name"),
            ("in_range", "r3", "age", 0, 120),
            ("unique", "r5", ["id"]),
            ("ref_integrity", "r6", "team", teams, "team"),
        ],
        group_by=["team"],
    )
    rep = {(r["team"], r["rule_id"]): r.asDict() for r in out.collect()}
    # team x: rows (1,a,30),(2,b,200),(None-id,e,10),(None-id,f,20)
    assert rep[("x", "r1")]["n_violations"] == 0
    assert rep[("x", "r3")]["n_violations"] == 1          # age 200
    assert rep[("x", "r5")]["n_violations"] == 1          # NULL ids dup
    assert rep[("x", "r5")]["n_rows"] == 4
    # team y: single row with NULL name
    assert rep[("y", "r1")]["n_violations"] == 1
    # team zz: unmatched in ref table -> its ONE non-null fk misses
    assert rep[("zz", "r6")]["n_violations"] == 1
    # NULL team is its own group for row-local/unique rules
    assert rep[(None, "r1")]["n_rows"] == 1
    # ref rule drops NULL fks, so no NULL-team ref row exists
    assert (None, "r6") not in rep
    # per-group evaluation covers every (group, rule) with data
    assert len({g for g, _ in rep}) == 4


def test_verify_plan_shape(spark, people, teams):
    # the Deequ scan-sharing contract: ANY number of row-local rules
    # = ONE whole-frame aggregate (single tiny combine exchange, the
    # forecast_revenue shape) and an inline plan-level unpack
    row_local = dq.verify(
        people,
        [("not_null", "r1", "name"), ("not_null", "r2", "id"),
         ("in_range", "r3", "age", 0, 120),
         ("accepted_values", "r4", "team", ["x", "y"])],
    )
    assert C.count_shuffles(row_local) <= 1
    assert not C.data_sized_partitionless_windows(row_local)
    # each unique rule adds one key-partitioned aggregate; each ref
    # rule one key-partitioned join — bounded extras, no windows
    full = dq.verify(
        people,
        [("not_null", "r1", "name"), ("unique", "r5", ["id"]),
         ("ref_integrity", "r6", "team", teams, "team")],
    )
    plan = C.simple_plan(full)
    assert C.count_shuffles(full) <= 7
    assert "partial_count" in plan or "partial_sum" in plan
    assert not C.data_sized_partitionless_windows(full)


def test_verify_accepted_values_none_guard(spark, people):
    # a None member can never match (NULLs pass by contract) and
    # under three-valued logic would silently zero the violation
    # count for every non-matching row — r17 ADVICE, loud guard
    with pytest.raises(ValueError, match="may not contain None"):
        dq.verify(people, [("accepted_values", "r1", "team", ["x", None])])


def test_verify_group_by_dunder_guard(spark, people):
    # the shared row-local aggregate claims __v0..__vN; a dunder
    # group name must fail loudly, not as a duplicate-column
    # AnalysisException — r17 ADVICE
    with pytest.raises(ValueError, match="may not start with '__'"):
        dq.verify(people, [("not_null", "r1", "id")], group_by=["__v0"])
    with pytest.raises(ValueError, match="may not start with '__'"):
        dq.verify(people, [("not_null", "r1", "id")], group_by=["__anything"])


def test_verify_by_group_randomized_property(spark, teams):
    # brute-force randomized property for the per-group form (r17
    # verdict surplus item: the per-group path is newer than the
    # whole-frame path it shares code with) — every (group, rule)
    # count re-derived sequentially in plain Python
    import random
    from collections import Counter, defaultdict

    rnd = random.Random(20260816)
    rows = [
        (
            rnd.choice([None, 0, 1, 2, 3, 4, 5]),
            rnd.choice([None, "a", "b"]),
            rnd.choice([None] + list(range(-5, 130, 7))),
            rnd.choice([None, "x", "y", "z"]),
        )
        for _ in range(80)
    ]
    df = spark.createDataFrame(rows, "id int, name string, age int, team string")
    out = dq.verify(
        df,
        [
            ("not_null", "n1", "name"),
            ("in_range", "n2", "age", 0, 120),
            ("accepted_values", "n3", "name", ["a"]),
            ("unique", "n4", ["id"]),
            ("ref_integrity", "n5", "team", teams, "team"),
        ],
        group_by=["team"],
    )
    rep = {
        (r["team"], r["rule_id"]): (r["n_rows"], r["n_violations"])
        for r in out.collect()
    }
    groups = defaultdict(list)
    for r in rows:
        groups[r[3]].append(r)
    ref = {"x", "y"}
    n_expected_rows = 0
    for g, rs in groups.items():
        n = len(rs)
        assert rep[(g, "n1")] == (n, sum(1 for r in rs if r[1] is None))
        assert rep[(g, "n2")] == (
            n, sum(1 for r in rs if r[2] is not None and not 0 <= r[2] <= 120)
        )
        assert rep[(g, "n3")] == (
            n, sum(1 for r in rs if r[1] is not None and r[1] != "a")
        )
        cnt = Counter(r[0] for r in rs)
        assert rep[(g, "n4")] == (n, sum(c - 1 for c in cnt.values()))
        fks = [r[3] for r in rs if r[3] is not None]
        n_expected_rows += 4
        if fks:
            n_expected_rows += 1
            assert rep[(g, "n5")] == (
                len(fks), sum(1 for v in fks if v not in ref)
            )
        else:
            assert (g, "n5") not in rep
    assert len(rep) == n_expected_rows


def test_verify_accepted_values_one_shot_iterable(spark, people):
    # r18 review finding: a generator domain must behave like its
    # materialized list — the empty/None guards used to consume it,
    # leaving _row_local_violations an empty isin that flagged every
    # non-null row with no error
    rep = _report(
        dq.verify(
            people,
            [("accepted_values", "r1", "team", iter(["x", "y"]))],
        )
    )
    assert rep["r1"]["n_violations"] == 1  # only 'zz'
    with pytest.raises(ValueError, match="may not contain None"):
        dq.verify(people, [("accepted_values", "r1", "team", iter(["x", None]))])
    with pytest.raises(ValueError, match="non-empty explicit value list"):
        dq.verify(people, [("accepted_values", "r1", "team", iter([]))])
