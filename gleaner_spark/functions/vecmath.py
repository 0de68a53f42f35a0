"""Vectorized embedding math: Arrow-batched pandas UDF cosine scoring.

Two formulations of the same cosine similarity exist in this repo:

* JVM column expressions (``plans.queries._cosine_expr`` —
  zip_with/aggregate).  Zero Python, but higher-order functions run
  INTERPRETED per element (measured 25× vs codegen for MinHash), so per
  row the cost is O(dim) interpreter steps.
* this module: one Arrow batch → one ``np.vstack`` → one BLAS-backed
  matrix-vector product for thousands of rows.  At 10^12-vector scale
  with dim ≥ 256 this is the formulation that keeps ANN scoring off the
  flame graph; the Arrow transfer is amortized across the batch.

Both produce identical rounded scores (unit-asserted + shared oracle),
so queries can choose per deployment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql import types as T


def cosine_to_query_udf(query_vec: list[float]):
    """Returns a pandas UDF col → cosine(col, query_vec) as double.

    The query vector is closed over (plain task-broadcast via pickled
    UDF), L2-normalized once per worker batch.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    norm = np.linalg.norm(q)
    if norm == 0.0:
        # cosine to the zero vector is undefined — fail fast instead of
        # returning all-NaN scores that sort ABOVE every real score
        # under desc (the JVM formulation yields NULLs that sort last;
        # silently diverging here would corrupt top-k)
        raise ValueError("query vector has zero norm")
    qn = q / norm

    @F.pandas_udf(T.DoubleType())
    def _cos(col: pd.Series) -> pd.Series:
        m = np.vstack(col.to_numpy())
        m = m.astype(np.float64, copy=False)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0.0] = 1.0
        return pd.Series((m @ qn) / norms)

    return _cos


def cosine_scores(df, embedding_col: str, query_vec: list[float],
                  out_col: str = "cos_sim", decimals: int = 6):
    """df + cosine-to-query column, rounded for cross-engine equality."""
    udf = cosine_to_query_udf(query_vec)
    return df.withColumn(out_col, F.round(udf(F.col(embedding_col)), decimals))
