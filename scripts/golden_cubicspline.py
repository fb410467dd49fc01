#!/usr/bin/env python3
"""Driver-side golden generator for the cubic-spline kernel
(NOT part of the Spark engine; numpy only).

Reimplements, in pure numpy, the exact published algorithm behind the
reference W10's method='cubic' (filter_engine.py:85-87 / dialogs.py:49
-> pandas -> scipy.interpolate.interp1d(kind='cubic') ->
make_interp_spline(x, y, k=3)):

  * not-a-knot knot vector (scipy _bsplines._not_a_knot): quadruple
    end knots, interior knots = the data sites minus the two nearest
    each end
  * B-spline coefficients from the collocation system B(x_i) c = y_i
  * evaluation by Cox-de Boor recursion (splev)

This file deliberately shares NO code shape with the Scala kernel
(graft.functions.Dsp.notAKnotCubicSpline): basis functions come from
the general-degree Cox-de Boor recursion rather than the BSPLVB
unrolling, and the collocation system is solved DENSE with numpy's
LAPACK gesv rather than an unpivoted banded LU.  Agreement between
the two implementations is therefore strong evidence both match
scipy's published algorithm.

Usage: python3 scripts/golden_cubicspline.py   # prints Scala literals
"""
import numpy as np

K = 3


def knots(x):
    """scipy _not_a_knot for k=3."""
    return np.r_[(x[0],) * (K + 1), x[2:-2], (x[-1],) * (K + 1)]


def bspl_basis(t, i, k, x):
    """Cox-de Boor: value of B_{i,k} over knots t at scalar x."""
    if k == 0:
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


def case(prefix, xs, ys, qs):
    t, c = fit(xs, ys)
    vs = [ev(t, c, q, xs[0], xs[-1]) for q in qs]
    scala(prefix + "KnotsT", xs)
    scala(prefix + "KnotsY", ys)
    scala(prefix + "EvalAt", qs)
    scala(prefix + "Golden", vs)


def main():
    rng = np.random.default_rng(20260815)
    # 17 non-uniform knots with a local jump: a not-a-knot global
    # solve spreads it differently from a natural spline everywhere
    xs = np.cumsum(rng.uniform(0.3, 1.7, size=17))
    ys = np.sin(xs) + rng.normal(0, 0.3, size=17)
    ys[9] += 4.0
    qs = np.concatenate([
        xs,
        (xs[:-1] + xs[1:]) / 2.0,
        rng.uniform(xs[0], xs[-1], size=8),
        [xs[0] - 1.0, xs[-1] + 1.0],
    ])
    case("qc", xs, ys, qs)
    # minimal n = 4 (no interior knots: one cubic through four points)
    x4 = np.array([0.0, 0.9, 2.2, 3.0])
    y4 = np.array([1.0, -0.7, 2.4, 0.3])
    case("qc4", x4, y4, np.array([0.0, 0.3, 0.9, 1.7, 2.9, 3.0]))
    # n = 5 (a single interior knot)
    x5 = np.array([0.0, 1.1, 1.9, 3.2, 4.0])
    y5 = np.array([0.5, 1.8, -0.4, 2.2, 2.0])
    case("qc5", x5, y5, np.array([0.0, 0.55, 1.5, 1.9, 2.6, 3.9, 4.0]))


if __name__ == "__main__":
    main()
