"""PCA / whitening queries over the embeddings table.

`emb_cov_block` pins the distributed moments path against plain SQL sums
(the same partial-aggregation the pandas batches do, written relationally
in DuckDB); the eigendecomposition itself is iterative-numeric (not SQL),
so projection/explained-variance queries are rows-only checked plus an
exact numpy differential test (tests/test_pca.py).
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.operators.pca import covariance, pca_fit, pca_project
from realtime_spark.operators.text import quantize
from realtime_spark.sources.testdata import load_table

_COV_BLOCK = 8  # oracle covers the leading 8x8 covariance block
_K = 8  # principal components kept


def q_emb_cov_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading block of the population covariance, computed through the
    SAME distributed-moments operator the PCA uses, quantized to 1e-6 —
    value-level proof that the Arrow-batched partials equal exact sums."""
    emb = load_table(spark, sf_dir, "embeddings")
    mean, cov, _ = covariance(emb)
    rows = [
        (i + 1, j + 1, float(cov[i, j]))
        for i in range(_COV_BLOCK)
        for j in range(_COV_BLOCK)
    ]
    out = spark.createDataFrame(rows, "i int, j int, cov double")
    return out.select(
        "i", "j", quantize(F.col("cov"), 6).alias("cov_q6")
    )


ORACLE_EMB_COV_BLOCK = f"""
WITH t AS (
  SELECT CAST(i AS INT) AS i, CAST(e AS DOUBLE) AS e, vec_id FROM (
    SELECT vec_id, generate_subscripts(embedding, 1) AS i,
           unnest(embedding) AS e
    FROM embeddings)
  WHERE i <= {_COV_BLOCK}
),
n AS (SELECT COUNT(*) AS n FROM embeddings),
m AS (SELECT i, SUM(e) AS s FROM t GROUP BY i),
xx AS (
  SELECT a.i AS i, b.i AS j, SUM(a.e * b.e) AS sxy
  FROM t a JOIN t b USING (vec_id)
  GROUP BY a.i, b.i
)
SELECT xx.i, xx.j,
       floor((sxy / n.n - (ma.s / n.n) * (mb.s / n.n)) * 1e6 + 0.5) / 1e6
         AS cov_q6
FROM xx
JOIN m ma ON ma.i = xx.i
JOIN m mb ON mb.i = xx.j
CROSS JOIN n
"""


def q_emb_pca_explained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k eigenvalues + explained-variance ratios (rows-only; pinned by
    the numpy differential test)."""
    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, k=_K)
    rows = [
        (i + 1, float(model["eigvals"][i]), float(model["explained"][i]))
        for i in range(len(model["eigvals"]))
    ]
    out = spark.createDataFrame(rows, "component int, eigval double, explained double")
    return out.select(
        "component",
        quantize(F.col("eigval"), 6).alias("eigval_q6"),
        quantize(F.col("explained"), 6).alias("explained_q6"),
    )


def q_emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitened top-k projection of every vector, quantized (rows-only +
    numpy differential test)."""
    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, k=_K)
    proj = pca_project(emb, model, whiten=True)
    return proj.select(
        "vec_id",
        F.transform(
            "pc", lambda x: F.floor(x * 10000.0 + F.lit(0.5)) / 10000.0
        ).alias("pc_q4"),
    )


_EIG_SCALE = 1000  # 1e-3 quantization of the cov block -> exact int powers


def q_emb_eig_powersums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newton power sums p_k = trace(B^k), k=1..8, of the 1e-3-quantized
    leading 8x8 covariance block, in EXACT integer arithmetic (python big
    ints; the oracle replays with HUGEINT matrix powers, values compared as
    strings — they exceed int64 by k=6).

    The spectrum of B is uniquely determined by (p_1..p_8) via Newton's
    identities, so this IS an eigenvalue check with no iterative numerics
    to diverge between engines: tests/test_pca.py ties the oracled power
    sums to numpy's eigvalsh of the same block. Together with the
    differential test on the full-dim model, this closes the oracle gap the
    float eigendecomposition itself cannot bridge (no closed form at d=8)."""
    emb = load_table(spark, sf_dir, "embeddings")
    _, cov, _ = covariance(emb)
    d = _COV_BLOCK
    B = [
        [int(math.floor(cov[i, j] * _EIG_SCALE + 0.5)) for j in range(d)]
        for i in range(d)
    ]
    rows = []
    M = B
    for k in range(1, d + 1):
        if k > 1:
            M = [
                [sum(M[i][t] * B[t][j] for t in range(d)) for j in range(d)]
                for i in range(d)
            ]
        rows.append((k, str(sum(M[i][i] for i in range(d)))))
    return spark.createDataFrame(rows, "k int, p string")


def _oracle_eig_powersums() -> str:
    d = _COV_BLOCK
    ctes = [f"""
cov AS (
  SELECT xx.i, xx.j,
         CAST(floor((sxy / n.n - (ma.s / n.n) * (mb.s / n.n)) * {_EIG_SCALE}
                    + 0.5) AS HUGEINT) AS v
  FROM xx JOIN m ma ON ma.i = xx.i JOIN m mb ON mb.i = xx.j CROSS JOIN n
),
b1 AS (SELECT i, j, v FROM cov)"""]
    for k in range(2, d + 1):
        ctes.append(
            f"b{k} AS (SELECT a.i, b.j, SUM(a.v * b.v) AS v "
            f"FROM b{k - 1} a JOIN b1 b ON a.j = b.i GROUP BY a.i, b.j)"
        )
    traces = "\nUNION ALL\n".join(
        f"SELECT {k} AS k, CAST(SUM(CASE WHEN i = j THEN v END) AS VARCHAR)"
        f" AS p FROM b{k}"
        for k in range(1, d + 1)
    )
    base = ORACLE_EMB_COV_BLOCK.split("SELECT xx.i")[0].strip().rstrip(",")
    return f"{base},\n{','.join(ctes)}\n{traces}"


def pca_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "emb_cov_block": q_emb_cov_block,
        "emb_pca_explained": q_emb_pca_explained,
        "emb_pca_project": q_emb_pca_project,
        "emb_eig_powersums": q_emb_eig_powersums,
    }


def pca_oracles() -> dict[str, str]:
    return {
        "emb_cov_block": ORACLE_EMB_COV_BLOCK,
        "emb_eig_powersums": _oracle_eig_powersums(),
    }
