"""Frame — thin wrapper: DataFrame + properties + declared order.

The reference's data-frame struct carries, beyond its columns:
table-level *properties* (arbitrary key->value; reference
``private/df.rkt:311-327``), per-series *sort invariants*
(``df-set-sorted!`` ``df.rkt:272-274``), a *default weight series*
for weighted statistics (``private/statistics.rkt:36-41``), and
secondary indexes (``df.rkt:1109-1217``).

In Spark, sortedness and indexes are not storage artifacts but plan
properties: a declared order column means "iterate/window over
ORDER BY these columns", and a secondary index is exactly an
``orderBy(cols)`` specification that lookup operators use as their
sort key. The Frame therefore carries *metadata only* — the wrapped
DataFrame stays a plain lazy logical plan so Catalyst sees
everything (no materialization, no driver-side state).

Mutation-style APIs (add/drop/rename series, derived columns) return
a new Frame sharing properties, mirroring the reference's
"data-frames are meant to stay unchanged once constructed"
(``df.rkt:1167-1170``).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class Frame:
    """A DataFrame plus reference-style frame metadata."""

    def __init__(
        self,
        df: DataFrame,
        properties: Mapping[str, Any] | None = None,
        order_by: Iterable[str] | None = None,
        indexes: Mapping[str, list[str]] | None = None,
    ):
        self.df = df
        self.properties: dict[str, Any] = dict(properties or {})
        #: declared natural order of the frame (reference: per-series cmpfn);
        #: operators that need "row order" (lag/lead, as-of, cumulative)
        #: window over these columns.
        self.order_by: list[str] = list(order_by or [])
        #: name -> ordered column list (reference: secondary indexes,
        #: df.rkt:1109-1114). Purely a declared sort key for lookups.
        self.indexes: dict[str, list[str]] = dict(indexes or {})

    # -- construction -------------------------------------------------
    @classmethod
    def from_dict(cls, spark: SparkSession, data: Mapping[str, list], **kw) -> "Frame":
        """Programmatic construction from column vectors
        (reference ``make-data-frame`` ``df.rkt:48-63``)."""
        cols = list(data)
        n = {len(v) for v in data.values()}
        if len(n) > 1:
            raise ValueError(f"all series must have the same length, got {n}")
        rows = list(zip(*[data[c] for c in cols])) if cols else []
        return cls(spark.createDataFrame(rows, schema=cols), **kw)

    # -- properties (df.rkt:311-327) ----------------------------------
    def put_property(self, key: str, value: Any) -> "Frame":
        p = dict(self.properties)
        p[key] = value
        return Frame(self.df, p, self.order_by, self.indexes)

    def get_property(self, key: str, default: Any = None) -> Any:
        return self.properties.get(key, default)

    def del_property(self, key: str) -> "Frame":
        p = dict(self.properties)
        p.pop(key, None)
        return Frame(self.df, p, self.order_by, self.indexes)

    # -- series management (df.rkt:201-266) ---------------------------
    @property
    def series_names(self) -> list[str]:
        return self.df.columns

    def contains(self, *names: str) -> bool:
        return all(n in self.df.columns for n in names)

    def contains_any(self, *names: str) -> bool:
        return any(n in self.df.columns for n in names)

    def add_series(self, name: str, col: Column) -> "Frame":
        return self._with(self.df.withColumn(name, col))

    def add_derived(self, name: str, fn: Callable[..., Column], *base: str) -> "Frame":
        """Reference ``df-add-derived!`` (df.rkt:248-252): new column as a
        function of base columns. ``fn`` receives Columns and returns a
        Column expression; lazy by construction (Spark plans are lazy,
        so this also covers ``df-add-lazy!`` df.rkt:258-266)."""
        return self._with(self.df.withColumn(name, fn(*[F.col(b) for b in base])))

    def drop_series(self, *names: str) -> "Frame":
        return self._with(self.df.drop(*names))

    def rename_series(self, old: str, new: str) -> "Frame":
        idx = {
            k: [new if c == old else c for c in v] for k, v in self.indexes.items()
        }
        order = [new if c == old else c for c in self.order_by]
        return Frame(self.df.withColumnRenamed(old, new), self.properties, order, idx)

    # -- order / index declarations -----------------------------------
    def set_sorted(self, *cols: str) -> "Frame":
        """Declare the frame's natural order (reference ``df-set-sorted!``
        df.rkt:272-274 validates an existing order; we *declare* the
        order and let operators sort/window by it — same downstream
        semantics, robust to unsorted input)."""
        return Frame(self.df, self.properties, list(cols), self.indexes)

    def add_index(self, name: str, *cols: str) -> "Frame":
        idx = dict(self.indexes)
        idx[name] = list(cols)
        return Frame(self.df, self.properties, self.order_by, idx)

    # -- weight series (statistics.rkt:36-41) -------------------------
    def set_default_weight_series(self, name: str | None) -> "Frame":
        return self.put_property("weight-series", name)

    def get_default_weight_series(self) -> str | None:
        return self.properties.get("weight-series")

    # -- reference-parity shims ----------------------------------------
    def shallow_copy(self) -> "Frame":
        """``df-shallow-copy`` (df.rkt:71-82): plans are immutable, so
        a copy shares the DataFrame and clones the metadata."""
        return Frame(self.df, dict(self.properties), list(self.order_by), dict(self.indexes))

    def duplicate_series(self, name: str, new_name: str) -> "Frame":
        """``df-duplicate-series`` (df.rkt:87-89)."""
        return self._with(self.df.withColumn(new_name, F.col(name)))

    def ref(self, i: int, *cols: str):
        """``df-ref``/``df-ref*`` (df.rkt:168-178): point read at row
        position ``i`` of the declared order. Positional access is a
        test/debug shim in a distributed engine (the reference's
        binary-search machinery dissolves into predicates) — this
        sorts and skips, never collecting more than one row.

        The WRITE side (``df-set!``, df.rkt:179-182) stays a
        documented non-goal at frame level — immutable plans — but
        its durable-table analog is
        ``operators/scd.py:merge_upsert`` (keyed overwrite with SQL
        MERGE semantics): point-mutate by KEY, not by position,
        which is the only form that survives distribution."""
        if not self.order_by:
            raise ValueError("ref requires a declared order (set_sorted)")
        row = self.df.orderBy(*self.order_by).offset(i).limit(1).collect()
        if not row:
            raise IndexError(i)
        return tuple(row[0][c] for c in cols) if cols else tuple(row[0])

    def iter_rows(self, reverse: bool = False):
        """``in-data-frame`` (df.rkt:589-632) incl. reverse iteration:
        a driver-side ordered iterator (``toLocalIterator`` — one
        partition in memory at a time)."""
        order = self.order_by or self.df.columns[:1]
        cols = [F.col(c) for c in order]
        df = self.df.orderBy(*[c.desc() for c in cols] if reverse else cols)
        return df.toLocalIterator()

    # -- misc ----------------------------------------------------------
    def row_count(self) -> int:
        return self.df.count()

    def _with(self, df: DataFrame) -> "Frame":
        return Frame(df, self.properties, self.order_by, self.indexes)

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"Frame(cols={self.df.columns}, order_by={self.order_by}, "
            f"properties={list(self.properties)})"
        )
