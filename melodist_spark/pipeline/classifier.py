"""Distributed quality-classifier training (logistic regression).

The last mile of a curation pipeline: turn heuristic signals
(quality features, LM perplexity, dedup flags) into one calibrated
keep-probability, trained against whatever labels exist (human
ratings, a held-out "known good" corpus, downstream evals). The
fastText/DSIR-style deployment is a tiny linear model applied to
every document — so the *scoring* must be a pure column expression
(JVM codegen, no UDF in the per-document path) and the *training*
must reduce the corpus to sufficient statistics instead of shipping
rows anywhere.

Iteratively reweighted least squares (IRLS — the classical Newton
method for the logistic MLE): each iteration needs only
``X^T S X`` ((d+1)² weighted feature cross-moments) and
``X^T (y - p)`` (d+1 residual moments) — ~35 aggregate expressions
for d=7, one map-side-combined pass over the corpus per iteration.
The driver solves the (d+1)×(d+1) system (the model boundary, same
as the k-means centroids / BPE merges / PQ codebooks). Features are
standardized from a one-pass mean/std aggregate folded into the
expressions, so conditioning is independent of feature units.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return 1.0 / (1.0 + F.exp(-z))


def _standardizer(
    df: DataFrame, feature_cols: list[str]
) -> tuple[np.ndarray, np.ndarray]:
    """One-pass per-feature mean/std (population), zeros-safe."""
    aggs = []
    for c in feature_cols:
        aggs.append(F.avg(F.col(c).cast("double")).alias(f"m_{c}"))
        aggs.append(F.stddev_pop(F.col(c).cast("double")).alias(f"s_{c}"))
    row = df.agg(*aggs).collect()[0]
    mu = np.array([row[f"m_{c}"] or 0.0 for c in feature_cols])
    sd = np.array([row[f"s_{c}"] or 0.0 for c in feature_cols])
    sd[sd <= 0] = 1.0
    return mu, sd


def _z_cols(
    feature_cols: list[str], mu: np.ndarray, sd: np.ndarray
) -> list[Column]:
    return [
        ((F.col(c).cast("double") - float(m)) / float(s))
        for c, m, s in zip(feature_cols, mu, sd)
    ]


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 8,
    ridge: float = 1e-8,
    tol: float = 1e-10,
    max_step: float = 10.0,
) -> dict:
    """Train logistic regression by IRLS; returns the model dict
    ``{"weights", "intercept", "mu", "sd", "feature_cols"}`` with
    weights in STANDARDIZED feature space (``mu``/``sd`` fold the
    standardization back in at scoring time).

    Each Newton step is ONE aggregation pass over the corpus
    producing the (d+1)×(d+1) weighted cross-moment matrix and the
    residual vector; rows never leave the executors. ``ridge``
    regularizes the solve (and is the tie-breaker that keeps the
    trained model deterministic on degenerate data).

    Step control (deterministic, no extra corpus passes): iteration
    stops early once the mean absolute gradient drops below ``tol``
    (converged — further steps only burn aggregation passes), and
    each Newton step is clipped to ``max_step`` in standardized
    L2 norm (a trust region). The clip is what bounds the
    linearly-separable case: the logistic MLE does not exist there,
    so undamped Newton grows the weights every iteration until
    ``exp`` saturates — with the clip, weights grow at most
    ``iters·max_step``, scores stay finite, and the fit is still the
    maximally-confident separator the data supports. Both guards are
    mirrored bit-for-bit in :func:`logreg_train_local`."""
    d = len(feature_cols)
    # persist the (features, label) projection: every Newton step and
    # the standardizer aggregate over the same narrow columns — cache
    # once instead of recomputing the feature expressions iters+1
    # times over the corpus
    df = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias(label_col),
    ).persist()
    try:
        return _logreg_train_cached(
            df, feature_cols, label_col, iters, ridge, d, tol, max_step
        )
    finally:
        df.unpersist()


def _newton_step(w, H, g, ridge, max_step):
    """Shared solve + trust-region clip — the exact arithmetic both
    the distributed and the numpy-reference trainers apply, so the
    parity test pins the whole step, guards included."""
    H = H + ridge * np.eye(len(w))
    delta = np.linalg.solve(H, g)
    nrm = float(np.linalg.norm(delta))
    if nrm > max_step:
        delta *= max_step / nrm
    return w + delta


def _logreg_train_cached(
    df, feature_cols, label_col, iters, ridge, d, tol, max_step
):
    mu, sd = _standardizer(df, feature_cols)
    w = np.zeros(d + 1)  # [intercept, w_1..w_d]

    y = F.col(label_col).cast("double")
    for _ in range(iters):
        zs = _z_cols(feature_cols, mu, sd)
        xs = [F.lit(1.0)] + zs  # design row with intercept
        eta = F.lit(float(w[0]))
        for j in range(d):
            eta = eta + zs[j] * float(w[j + 1])
        p = _sigmoid(eta)
        s = p * (1.0 - p)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for i in range(d + 1):
            for j in range(i, d + 1):
                aggs.append(F.sum(s * xs[i] * xs[j]).alias(f"h_{i}_{j}"))
        for i in range(d + 1):
            aggs.append(F.sum((y - p) * xs[i]).alias(f"g_{i}"))
        row = df.agg(*aggs).collect()[0]
        n = row["n_rows"] or 1
        H = np.zeros((d + 1, d + 1))
        g = np.zeros(d + 1)
        for i in range(d + 1):
            g[i] = row[f"g_{i}"] or 0.0
            for j in range(i, d + 1):
                H[i, j] = H[j, i] = row[f"h_{i}_{j}"] or 0.0
        if float(np.abs(g).max()) <= tol * n:
            break  # converged: stop burning aggregation passes
        w = _newton_step(w, H, g, ridge, max_step)
    return {
        "weights": w[1:],
        "intercept": float(w[0]),
        "mu": mu,
        "sd": sd,
        "feature_cols": list(feature_cols),
    }


def logreg_score(
    df: DataFrame, model: dict, out_col: str = "quality_score"
) -> DataFrame:
    """Attach the keep-probability — a pure codegen expression
    (sigmoid of a literal-weighted sum over standardized features):
    the per-document scoring path contains no UDF and no shuffle, so
    it rides along any scan for free."""
    zs = _z_cols(model["feature_cols"], model["mu"], model["sd"])
    eta = F.lit(model["intercept"])
    for z, wj in zip(zs, model["weights"]):
        eta = eta + z * float(wj)
    return df.withColumn(out_col, _sigmoid(eta))


def logreg_train_local(
    X: np.ndarray,
    y: np.ndarray,
    iters: int = 8,
    ridge: float = 1e-8,
    tol: float = 1e-10,
    max_step: float = 10.0,
) -> np.ndarray:
    """Numpy reference of the same IRLS (standardized design with
    intercept prepended, identical convergence stop and trust-region
    clip) — used by tests to pin the distributed trainer to the
    textbook algorithm step for step."""
    n, d = X.shape
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd <= 0] = 1.0
    Z = np.hstack([np.ones((n, 1)), (X - mu) / sd])
    w = np.zeros(d + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Z @ w)))
        s = p * (1.0 - p)
        H = Z.T @ (Z * s[:, None])
        g = Z.T @ (y - p)
        if float(np.abs(g).max()) <= tol * n:
            break
        w = _newton_step(w, H, g, ridge, max_step)
    return w
