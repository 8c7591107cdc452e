"""Distributed PCA over an embedding column — the dimensionality
reduction a 100 TB vector corpus runs before IVF/PQ indexing or
semantic-dedup clustering (and the whitening step OPQ-style rotations
start from).

Execution shape (the same one MLlib's RowMatrix.computePrincipalComponents
uses, re-expressed over the DataFrame API): one ``mapInPandas`` pass
emits per-batch moment partials (count, sum vector, flattened
sum-of-outer-products — d*(d+3)/2 + 1 doubles per batch, d = 64 here),
a tiny aggregation reduces them, and the d x d covariance eigensolve
runs on the driver (d is small by assumption; the DATA never leaves the
executors). Projection is then a broadcast matrix times each row,
vectorized in Arrow batches.

Why not pyspark.ml.feature.PCA directly: identical distributed shape,
but its Gram accumulation offers no layout-determinism contract — float
partial sums arrive in partition order, so two runs with different
partitionings disagree in the last ulps and an exact-hash oracle gate
flips. Here the covariance matrix is ROUNDED (``cov_decimals``, default
8) before the eigensolve: accumulated float64 jitter is ~1e-13 relative
for billions of rows, far below the rounding quantum, so any partition
layout yields the bit-identical rounded matrix -> identical
eigenvectors -> identical projections. Eigenvector sign is fixed by
making each component's largest-|coordinate| entry positive (the
standard convention; numpy's sign is otherwise arbitrary).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _moment_partials(vec_col: str, d: int):
    import pandas as pd

    tri = np.triu_indices(d)

    def fn(batches):
        n = 0
        s = np.zeros(d)
        outer = np.zeros((d, d))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pdf[vec_col].isna().any():
                raise ValueError(
                    f"pca_fit: NULL value in '{vec_col}' — filter "
                    "nulls before fitting")
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if x.ndim != 2 or x.shape[1] != d:
                raise ValueError(
                    f"pca_fit: ragged or wrong-width '{vec_col}' "
                    f"(expected uniform dim {d})")
            n += x.shape[0]
            s += x.sum(axis=0)
            outer += x.T @ x
        if n == 0:
            return
        yield pd.DataFrame({
            "n": [n],
            "s": [s.tolist()],
            "outer_tri": [outer[tri].tolist()],
        })

    return fn


def pca_fit(df: DataFrame, k: int, vec_col: str = "embedding",
            cov_decimals: int = 8):
    """Fit PCA: returns ``(mean, components, explained_var)`` as numpy
    arrays — mean (d,), components (k, d) rows = top-k eigenvectors by
    descending eigenvalue, explained_var (k,) the matching eigenvalues
    of the (population, 1/n) covariance. Deterministic across partition
    layouts per the module contract."""
    head = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if head is None:
        raise ValueError(
            f"pca_fit: no non-null '{vec_col}' values to fit on")
    d = len(head[0])
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}]")
    schema = "n long, s array<double>, outer_tri array<double>"
    parts = df.select(vec_col).mapInPandas(
        _moment_partials(vec_col, d), schema=schema).collect()
    if not parts:
        raise ValueError("pca_fit on an empty DataFrame")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    tri_sum = np.sum([np.asarray(p["outer_tri"]) for p in parts], axis=0)
    outer = np.zeros((d, d))
    iu = np.triu_indices(d)
    outer[iu] = tri_sum
    outer = outer + outer.T - np.diag(np.diag(outer))
    mean = s / n
    cov = outer / n - np.outer(mean, mean)
    cov = np.round(cov, cov_decimals)  # layout-determinism quantum
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    # sign convention: largest-|coordinate| entry positive
    for row in comps:
        j = np.argmax(np.abs(row))
        if row[j] < 0:
            row *= -1
    return mean, comps, evals[order]


def pca_project(df: DataFrame, k: int, vec_col: str = "embedding",
                out_col: str = "pca", decimals: int = 6,
                fitted=None, whiten: bool = False,
                eps: float = 1e-9) -> DataFrame:
    """Project every row onto the top-k principal components
    (``out_col`` = array<double> length k, rounded to ``decimals`` for
    cross-run/engine stability). ``fitted`` reuses a ``pca_fit`` result
    (fit on a sample, project everywhere — the 100 TB pattern); default
    fits on ``df`` itself. ``whiten=True`` scales each coordinate by
    1/sqrt(eigenvalue + eps) so components come out unit-variance —
    the preprocessing OPQ-style rotations and Mahalanobis-ish scoring
    assume. Map-side only after the fit: the (k x d) component matrix
    rides the closure, no joins, no shuffle."""
    mean, comps, evar = fitted if fitted is not None else pca_fit(
        df, k, vec_col)
    import pandas as pd

    m = mean.copy()
    c = comps.T.copy()  # (d, k)
    if whiten:
        # covariance rounding can nudge a ~0 eigenvalue slightly
        # negative; clamp so sqrt never yields NaN columns
        c = c / np.sqrt(np.maximum(np.asarray(evar), 0.0) + eps)

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            proj = np.round((x - m) @ c, decimals)
            out = pdf.drop(columns=[vec_col])
            out[out_col] = list(proj)
            yield out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != vec_col
    ) + f", {out_col} array<double>"
    return df.mapInPandas(project, schema=out_schema)
