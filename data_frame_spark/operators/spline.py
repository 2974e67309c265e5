"""Natural cubic spline interpolation (reference spline.rkt:163-192).

The reference fits a natural cubic spline through >= 3 data points
(tridiagonal system) and evaluates it anywhere, with LINEAR
extrapolation outside the knot range (spline.rkt uses the first/last
segment's end slope).

Scale stance: spline *fitting* happens on small curves (mean-max
tables, fit summaries — tens to hundreds of knots), so the solve is
driver-side numpy on collected knots — the same judgement call the
reference makes (SURVEY §2.9). *Evaluation* is distributed: the
fitted coefficients broadcast into a Column expression over knot
intervals, so a 100 TB table can be scored against a spline without
any driver involvement.
"""

from __future__ import annotations

import bisect

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Spline:
    """Natural cubic spline y(x) through knots; linear extrapolation
    outside the range. Callable scalar-side; ``predict`` builds a
    Column expression for distributed evaluation."""

    def __init__(self, xs, ys):
        xs = np.asarray(xs, dtype=float)
        ys = np.asarray(ys, dtype=float)
        order = np.argsort(xs)
        self.x = xs[order]
        self.y = ys[order]
        n = len(self.x)
        if n < 3:
            raise ValueError("spline needs at least 3 points")
        h = np.diff(self.x)
        # natural spline: second derivatives M solve a tridiagonal system
        A = np.zeros((n, n))
        rhs = np.zeros(n)
        A[0, 0] = A[-1, -1] = 1.0
        for i in range(1, n - 1):
            A[i, i - 1] = h[i - 1]
            A[i, i] = 2 * (h[i - 1] + h[i])
            A[i, i + 1] = h[i]
            rhs[i] = 6 * (
                (self.y[i + 1] - self.y[i]) / h[i]
                - (self.y[i] - self.y[i - 1]) / h[i - 1]
            )
        self.m = np.linalg.solve(A, rhs)
        self.h = h

    def _eval_segment(self, i: int, xv: float) -> float:
        x0, x1 = self.x[i], self.x[i + 1]
        y0, y1 = self.y[i], self.y[i + 1]
        m0, m1 = self.m[i], self.m[i + 1]
        h = x1 - x0
        a = (x1 - xv) / h
        b = (xv - x0) / h
        return (
            a * y0
            + b * y1
            + ((a**3 - a) * m0 + (b**3 - b) * m1) * h * h / 6
        )

    def _slope(self, i: int, xv: float) -> float:
        x0, x1 = self.x[i], self.x[i + 1]
        y0, y1 = self.y[i], self.y[i + 1]
        m0, m1 = self.m[i], self.m[i + 1]
        h = x1 - x0
        a = (x1 - xv) / h
        b = (xv - x0) / h
        return (y1 - y0) / h + ((1 - 3 * a * a) * m0 + (3 * b * b - 1) * m1) * h / 6

    def __call__(self, xv: float) -> float:
        if xv <= self.x[0]:  # linear extrapolation at the ends
            s = self._slope(0, self.x[0])
            return float(self.y[0] + s * (xv - self.x[0]))
        if xv >= self.x[-1]:
            s = self._slope(len(self.x) - 2, self.x[-1])
            return float(self.y[-1] + s * (xv - self.x[-1]))
        i = min(bisect.bisect_right(self.x, xv) - 1, len(self.x) - 2)
        return float(self._eval_segment(i, xv))

    def predict(self, x: Column) -> Column:
        """Distributed evaluation: nested CASE over knot intervals —
        pure Column arithmetic, broadcast-free, codegen-friendly for
        the typical (small) knot counts."""
        n = len(self.x)
        s0 = self._slope(0, self.x[0])
        s1 = self._slope(n - 2, self.x[-1])
        expr = F.lit(float(self.y[0])) + F.lit(float(s0)) * (x - F.lit(float(self.x[0])))
        expr = F.when(x <= F.lit(float(self.x[0])), expr)
        for i in range(n - 1):
            x0, x1 = float(self.x[i]), float(self.x[i + 1])
            h = x1 - x0
            a = (F.lit(x1) - x) / F.lit(h)
            b = (x - F.lit(x0)) / F.lit(h)
            seg = (
                a * F.lit(float(self.y[i]))
                + b * F.lit(float(self.y[i + 1]))
                + ((a**3 - a) * F.lit(float(self.m[i])) + (b**3 - b) * F.lit(float(self.m[i + 1])))
                * F.lit(h * h / 6)
            )
            expr = expr.when(x < F.lit(x1), seg)
        tail = F.lit(float(self.y[-1])) + F.lit(float(s1)) * (x - F.lit(float(self.x[-1])))
        return expr.otherwise(tail)


def fit_spline(df: DataFrame, x_col: str, y_col: str) -> Spline:
    """Collect the (small) knot table and fit — the curve inputs are
    aggregate outputs (mean-max tables etc.), never raw data."""
    rows = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(F.col(x_col).cast("double"), F.col(y_col).cast("double"))
        .collect()
    )
    return Spline([r[0] for r in rows], [r[1] for r in rows])
