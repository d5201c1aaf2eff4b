"""Minimal derivative-free optimizer (Nelder-Mead).

scipy is not guaranteed in the runtime environment; the only consumer
is the Bristow-Campbell (A, C) fit (`radiation.py:251-280` uses
``scipy.optimize.minimize``). When scipy is importable we delegate to
it; otherwise this standard Nelder-Mead finds the same local minimum
of the |mean bias| objective.
"""

from __future__ import annotations

import numpy as np


def nelder_mead(
    f,
    x0,
    step: float = 0.1,
    xatol: float = 1e-6,
    fatol: float = 1e-6,
    max_iter: int = 500,
) -> np.ndarray:
    x0 = np.asarray(x0, dtype=float)
    n = len(x0)
    # initial simplex: x0 plus per-dimension steps
    simplex = [x0]
    for i in range(n):
        xi = x0.copy()
        xi[i] += step * (abs(xi[i]) if xi[i] != 0 else 1.0)
        simplex.append(xi)
    simplex = np.array(simplex)
    fvals = np.array([f(x) for x in simplex])

    alpha, gamma, rho, sigma = 1.0, 2.0, 0.5, 0.5
    for _ in range(max_iter):
        order = np.argsort(fvals)
        simplex, fvals = simplex[order], fvals[order]
        if (
            np.max(np.abs(simplex[1:] - simplex[0])) < xatol
            and np.max(np.abs(fvals[1:] - fvals[0])) < fatol
        ):
            break
        centroid = simplex[:-1].mean(axis=0)
        xr = centroid + alpha * (centroid - simplex[-1])
        fr = f(xr)
        if fvals[0] <= fr < fvals[-2]:
            simplex[-1], fvals[-1] = xr, fr
        elif fr < fvals[0]:
            xe = centroid + gamma * (xr - centroid)
            fe = f(xe)
            if fe < fr:
                simplex[-1], fvals[-1] = xe, fe
            else:
                simplex[-1], fvals[-1] = xr, fr
        else:
            xc = centroid + rho * (simplex[-1] - centroid)
            fc = f(xc)
            if fc < fvals[-1]:
                simplex[-1], fvals[-1] = xc, fc
            else:
                for i in range(1, n + 1):
                    simplex[i] = simplex[0] + sigma * (simplex[i] - simplex[0])
                    fvals[i] = f(simplex[i])
    best = np.argmin(fvals)
    return simplex[best]


def minimize2(f, x0) -> np.ndarray:
    """scipy.optimize.minimize if available, else Nelder-Mead."""
    try:
        import scipy.optimize

        return scipy.optimize.minimize(f, x0).x
    except ImportError:
        return nelder_mead(f, x0)
