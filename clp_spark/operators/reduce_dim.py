"""Distributed PCA over an embedding column: dimensionality reduction for
downstream clustering/ANN/visualization — the embedding-compaction step of a
training-data pipeline (cut storage and ANN cost by projecting d-dim vectors
to k dims while keeping most variance).

No counterpart in the reference repo; training-data-pipeline extension
mandate, same as operators/similarity.py.

Scale shape (10^12-vector regime): PCA needs only the d×d second-moment
matrix, so the fit is ONE scan with O(d^2) per-partition state — each task
emits (n, sum_x, sum_xx^T flattened) from a numpy einsum, the driver reduces
P such rows and eigendecomposes a d×d matrix (d is the embedding dim, 64 in
the test corpus; eigh on d<=4096 is milliseconds). No shuffle at all. For
very large d·P (d >= ~2048 at 10^5 tasks) insert a tree-reduce stage (sum
the partials with a second Spark agg keyed by partition-id // fanout) before
the driver; the projection is embarrassingly parallel either way.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_fit", "pca_project"]


def pca_fit(
    df: DataFrame, k: int = 8, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA -> (mean[d], components[k,d], explained_variance[k]).

    Exact (not randomized/sketched): covariance = (sum_xx - n*mu mu^T)/(n-1)
    assembled from per-partition moment partials, then a driver-side `eigh`.
    Deterministic sign convention: each component is flipped so its
    largest-|coordinate| entry is positive, making results reproducible
    across partitionings and engines (eigenvectors are only defined up to
    sign).
    """
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )

    def partials(batches):
        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]})

    rows = df.select(vec_col).mapInPandas(partials, out_schema).collect()
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals, kind="stable")[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign convention: largest-|coordinate| entry positive
    flip = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return mean, comps, evals[order]


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Project vectors onto the fitted components -> df + out_col
    (array<double> of len k). One batched numpy matmul per Arrow batch;
    embarrassingly parallel, no shuffle."""
    import pandas as pd
    from pyspark.sql import types as T

    mu = np.asarray(mean, dtype=np.float64)
    ct = np.asarray(components, dtype=np.float64).T  # (d, k)
    out_schema = T.StructType(
        list(df.schema) + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            p = (x - mu) @ ct
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(list(p), index=pdf.index).map(
                lambda a: a.tolist()
            )
            yield pdf

    return df.mapInPandas(run, out_schema)
