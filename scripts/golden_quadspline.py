#!/usr/bin/env python3
"""Driver-side golden generator for the quadratic-spline kernel
(NOT part of the Spark engine; numpy only).

Reimplements, in pure numpy, the exact published algorithm behind the
reference W10's method='quadratic' (dialogs.py:49 -> pandas ->
scipy.interpolate.interp1d(kind='quadratic') ->
make_interp_spline(x, y, k=2)):

  * knot vector for even k (scipy _bsplines.py): interior knots at the
    data midpoints with the first and last midpoint dropped ("a la
    not-a-knot"), triple end knots
  * B-spline coefficients from the collocation system B(x_i) c = y_i
  * evaluation by Cox-de Boor recursion (splev)

This file deliberately shares NO code shape with the Scala kernel
(graft.functions.Dsp.quadraticSpline): basis functions come from the
general-degree Cox-de Boor recursion rather than closed forms, and the
collocation system is solved DENSE with numpy's LAPACK gesv rather
than a Thomas sweep.  Agreement between the two implementations is
therefore strong evidence both match scipy's published algorithm.

Usage: python3 scripts/golden_quadspline.py   # prints Scala literals
"""
import numpy as np

K = 2


def knots(x):
    """scipy make_interp_spline's knot vector for k=2."""
    t = (x[1:] + x[:-1]) / 2.0
    return np.r_[(x[0],) * (K + 1), t[1:-1], (x[-1],) * (K + 1)]


def bspl_basis(t, i, k, x):
    """Cox-de Boor: value of B_{i,k} over knots t at scalar x."""
    if k == 0:
        # half-open intervals, with the conventional closure of the
        # last nondegenerate interval at the right end
        if t[i] <= x < t[i + 1]:
            return 1.0
        if x == t[-1] and t[i] < t[i + 1] and t[i + 1] == t[-1]:
            return 1.0
        return 0.0
    out = 0.0
    d1 = t[i + k] - t[i]
    if d1 > 0:
        out += (x - t[i]) / d1 * bspl_basis(t, i, k - 1, x)
    d2 = t[i + k + 1] - t[i + 1]
    if d2 > 0:
        out += (t[i + k + 1] - x) / d2 * bspl_basis(t, i + 1, k - 1, x)
    return out


def fit(x, y):
    t = knots(x)
    n = len(x)
    A = np.zeros((n, n))
    for r in range(n):
        for c in range(n):
            A[r, c] = bspl_basis(t, c, K, x[r])
    return t, np.linalg.solve(A, y)


def ev(t, c, x0, lo, hi):
    x = min(max(x0, lo), hi)
    return sum(c[i] * bspl_basis(t, i, K, x) for i in range(len(c)))


def scala(name, arr):
    body = ", ".join(repr(float(v)) for v in arr)
    print(f"  val {name}: Array[Double] = Array({body})")


def main():
    rng = np.random.default_rng(20260814)
    # 17 non-uniform knots, values with a deliberate local jump so the
    # global-solve character (oscillation spread) is exercised
    xs = np.cumsum(rng.uniform(0.3, 1.7, size=17))
    ys = np.sin(xs) + rng.normal(0, 0.3, size=17)
    ys[9] += 4.0  # the jump
    t, c = fit(xs, ys)
    # evaluation sites: knots, midpoints, off-grid, out-of-range (clamped)
    qs = np.concatenate([
        xs,
        (xs[:-1] + xs[1:]) / 2.0,
        rng.uniform(xs[0], xs[-1], size=8),
        [xs[0] - 1.0, xs[-1] + 1.0],
    ])
    vs = [ev(t, c, q, xs[0], xs[-1]) for q in qs]
    scala("qsKnotsT", xs)
    scala("qsKnotsY", ys)
    scala("qsEvalAt", qs)
    scala("qsGolden", vs)
    # minimal case: n = 3 (single parabola through three points)
    x3 = np.array([0.0, 1.3, 2.1])
    y3 = np.array([1.0, -0.7, 2.4])
    t3, c3 = fit(x3, y3)
    q3 = np.array([0.0, 0.4, 0.65, 1.3, 1.9, 2.1])
    v3 = [ev(t3, c3, q, x3[0], x3[-1]) for q in q3]
    scala("qs3EvalAt", q3)
    scala("qs3Golden", v3)


if __name__ == "__main__":
    main()
