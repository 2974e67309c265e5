"""CSV reader/writer with the reference's ingestion semantics
(private/csv.rkt).

Reproduced (csv.rkt:93-280):
* optional header row; headerless synthesizes ``col0..colN``
* duplicate headers deduped as ``name (1)``, ``name (2)``...
* configurable NA string (default "") and NA *predicate*
* short rows NULL-padded (Spark PERMISSIVE mode), long rows truncated
* number inference with a post-cast pass

Intentional semantic delta (SURVEY §7): the reference types cells
*individually* (a column can mix numbers and strings) and
distinguishes quoted from unquoted numerals (#:quoted-numbers?).
A distributed scan types columns uniformly, so: a column becomes
numeric iff EVERY non-NA cell parses as a number; ``quoted_numbers``
therefore only documents intent. Mixed-type columns stay strings.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _dedup_headers(names: list[str]) -> list[str]:
    seen: dict[str, int] = {}
    out = []
    for n in names:
        if n in seen:
            seen[n] += 1
            out.append(f"{n} ({seen[n]})")
        else:
            seen[n] = 0
            out.append(n)
    return out


def _read_header_line(path: str) -> list[str] | None:
    """First line of the (first) CSV file — a driver-side metadata
    peek, not a data read."""
    import csv as _csv
    import glob
    import os

    target = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.csv"))) or sorted(
            glob.glob(os.path.join(path, "part-*"))
        )
        if not parts:
            return None
        target = parts[0]
    try:
        with open(target, newline="") as fh:
            # skipinitialspace: the reference's lexer allows
            # whitespace before a quoted header token
            return [h.strip() for h in next(_csv.reader(fh, skipinitialspace=True))]
    except (OSError, StopIteration):
        return None


def read_csv(
    spark: SparkSession,
    path: str,
    headers: bool = True,
    na: str = "",
    na_predicate: Callable[[Column], Column] | None = None,
    infer_numbers: bool = True,
) -> DataFrame:
    """``df-read/csv`` (csv.rkt:275-280). Distributed scan; header
    dedup and numeric post-cast happen on the schema, not the data.

    The reference's lexer skips whitespace before a quoted token
    (csv.rkt:139-161); a whitespace-then-quote cell reaches Spark's
    parser as literal text, so cells that are entirely one quoted
    token after trimming are unwrapped (and their doubled quotes
    unescaped) before NA/number handling."""
    df = (
        spark.read.option("header", str(headers).lower())
        .option("nullValue", na)
        .option("mode", "PERMISSIVE")
        .option("escape", '"')  # RFC doubled quotes (csv.rkt:163-171)
        .option("ignoreLeadingWhiteSpace", "true")
        .option("ignoreTrailingWhiteSpace", "true")
        .csv(path)
    )
    if headers:
        # Spark mangles duplicate headers with index suffixes; recover
        # the original names from the header line and apply the
        # reference's "name (k)" dedup convention (csv.rkt:228-236)
        original = _read_header_line(path)
        if original is not None and len(original) == len(df.columns):
            df = df.toDF(*_dedup_headers(original))
    else:
        df = df.toDF(*[f"col{i}" for i in range(len(df.columns))])

    # Spark's parser (univocity) already consumes well-formed quoting,
    # including whitespace-then-quote cells (ignoreLeadingWhiteSpace
    # skips the blanks OUTSIDE quotes, then parses the field as
    # quoted). A post-parser value that is still STRICTLY
    # quote-wrapped (`^"((?:[^"]|"")*)"$`) is therefore unescaped
    # CONTENT — e.g. file cell '"""hi"""' -> value '"hi"' — and must
    # be left alone (stripping it again was the write->read
    # round-trip bug). Only cells the parser returned RAW (an
    # unescaped quote after the closing quote: mixed quoted/unquoted
    # pieces like '"a,bc" 123 "d""ef"') need the reference lexer's
    # token-concatenation: doubled quotes escape, single quotes drop.
    quoted = r'^"((?:[^"]|"")*)"$'

    def _unwrap(col):
        mixed = F.regexp_replace(
            F.regexp_replace(F.regexp_replace(col, '""', "\x00"), '"', ""),
            "\x00",
            '"',
        )
        return (
            F.when(~col.rlike(quoted) & col.rlike(r'^".*"$'), mixed)
            .otherwise(col)
        )

    df = df.select(*[_unwrap(F.col(f"`{c}`")).alias(c) for c in df.columns])

    if na_predicate is not None:
        df = df.select(
            *[
                F.when(na_predicate(F.col(f"`{c}`")), F.lit(None))
                .otherwise(F.col(f"`{c}`"))
                .alias(c)
                for c in df.columns
            ]
        )

    if infer_numbers:
        # a column is numeric iff every non-NULL cell casts; one
        # aggregate decides, then one projection casts
        checks = df.agg(
            *[
                (
                    F.count(F.when(F.col(f"`{c}`").isNotNull(), 1))
                    == F.count(F.col(f"`{c}`").try_cast("double"))
                ).alias(c)
                for c in df.columns
            ]
        ).collect()[0]
        casts = []
        for c in df.columns:
            if checks[c]:
                casts.append(F.col(f"`{c}`").try_cast("double").alias(c))
            else:
                casts.append(F.col(f"`{c}`").alias(c))
        df = df.select(*casts)
    return df


def _golden_cell(v) -> str:
    """One cell in the reference writer's exact byte format
    (csv.rkt:40-72): NA -> empty, strings quoted with doubled quotes,
    exact integers bare, other reals via number->string. Our engine
    is double-typed, so integral doubles render as the reference's
    exact integers (1.0 -> "1") — the inverse of its read-side
    number parse."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return '"' + str(v) + '"'
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    s = str(v)
    return '"' + s.replace('"', '""') + '"'


def csv_string(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    start: int = 0,
    stop: int | None = None,
    order_by: Sequence[str] | None = None,
) -> str:
    """``df-write/csv`` to a string, byte-compatible with the
    reference's writer (csv.rkt:40-87, golden test
    df-test.rkt:1241-1264): headers always quoted, #:start/#:stop row
    range over the declared order. A driver-side single-file sink —
    the same judgement as the reference's output-port writer; use
    :func:`write_csv` for the distributed path."""
    cols = list(columns) if columns else df.columns
    out = df.select(*[f"`{c}`" for c in cols])
    if order_by:
        out = out.orderBy(*order_by)
    lines = [",".join('"' + c.replace('"', '""') + '"' for c in cols)]
    for i, row in enumerate(out.toLocalIterator()):
        if i < start:
            continue
        if stop is not None and i >= stop:
            break
        lines.append(",".join(_golden_cell(row[c]) for c in cols))
    return "\n".join(lines) + "\n"


def write_csv(
    df: DataFrame,
    path: str,
    columns: Sequence[str] | None = None,
    na_rep: str = "",
    header: bool = True,
    single_file: bool = False,
) -> None:
    """``df-write/csv`` (csv.rkt:40-87): selected series, NA -> empty
    cell, quotes doubled (Spark default). ``single_file`` coalesces
    to one part (small frames only — the distributed writer is the
    scale path)."""
    out = df.select(*columns) if columns else df
    if single_file:
        out = out.coalesce(1)
    (
        out.write.option("header", str(header).lower())
        .option("nullValue", na_rep)
        .option("emptyValue", na_rep)
        .option("escape", '"')  # write doubled quotes, as the reference does
        .mode("overwrite")
        .csv(path)
    )
