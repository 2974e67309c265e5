"""Blocked fuzzy matching (record linkage).

The classic linkage pipeline: a cheap BLOCKING key prunes the O(n²)
pair space to within-block candidates, then an edit-distance compare
scores each candidate pair. No reference twin — the reference has no
join at all (SURVEY §2.3); this is the corpus-hygiene operator a
training-data pipeline needs for entity resolution / near-identical
record collapse over string keys, complementing the token-based
near-dup stack (minhash/simhash) for SHORT strings where shingles
degenerate.

Scale contract: both sides are corpus-proportional, so candidates
meet in a SHUFFLE hash equi-join on the blocking key — never a
broadcast (same stance as the split-vs-split contamination audit).
Work is Σ_b |block_b|² — the caller chooses blocking granularity to
bound it; `levenshtein` runs JVM-side inside whole-stage codegen
(no Python in the hot path).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_dist: int | None = None,
) -> DataFrame:
    """Within-block candidate pairs of ``df`` with their Levenshtein
    distance: one row per unordered pair (``id_a < id_b``) sharing
    all ``block_cols``, with the blocking columns, ``dist``, and —
    when ``max_dist`` is given — an ``is_match`` flag.

    The self-join is pinned to a shuffle hash join on the blocking
    key: both sides scale with the corpus, so a broadcast would
    materialize the whole table per executor at scale. Skewed blocks
    (a hot blocking key) bound the largest task at |block|² — pick
    blocking columns accordingly or pre-salt upstream.
    """
    if not block_cols:
        raise ValueError("blocked_fuzzy_pairs requires block_cols (scale contract)")
    cols = [id_col, text_col, *block_cols]
    a = df.select(*cols).alias("a")
    b = df.select(*cols).alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in block_cols:
        cond = (F.col(f"a.{c}") == F.col(f"b.{c}")) & cond
    pairs = a.join(b.hint("SHUFFLE_HASH"), cond, "inner").select(
        F.col(f"a.{id_col}").alias(f"{id_col}_a"),
        F.col(f"b.{id_col}").alias(f"{id_col}_b"),
        *[F.col(f"a.{c}").alias(c) for c in block_cols],
        F.levenshtein(F.col(f"a.{text_col}"), F.col(f"b.{text_col}"))
        .cast("long")
        .alias("dist"),
    )
    if max_dist is not None:
        pairs = pairs.withColumn("is_match", F.col("dist") <= F.lit(int(max_dist)))
    return pairs
