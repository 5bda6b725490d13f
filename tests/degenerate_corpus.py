"""Degenerate-cardinality corpus: the same ten tables as the driver's
testdata, but TINY — single-digit row counts per fact table, taken as a
deterministic head-slice of sf0.001 with schemas preserved bit-for-bit.

Purpose: the third verification axis. The base gate (test_oracle.py) proves
Spark == DuckDB on realistic data; the stress gate (test_oracle_stress.py)
proves it on hostile CONTENT. This gate proves it on hostile CARDINALITY:
empty query samples (fixed predicates like `vec_id < 8` or `doc_id % 20 = 0`
may match nothing), one-row window partitions, zero near-dup pairs, empty
replay windows, single-member clusters, 1-centroid IVF. The failure classes
it exists to catch are the ones the round-4 stress gate caught only by
accident on its way to content bugs: ANSI crashes on empty-array
element_at / 0-divisors, empty-aggregate crossJoins feeding NULL math one
engine survives and the other doesn't, and driver-side `.collect()` folds
that assume at least one row.

Row budgets keep every operator family NON-vacuous where a fixture contract
demands it (embeddings keeps vec_id 0 so the `% 100 = 0` centroid predicate
matches exactly once -> 1-centroid IVF/PQ; events keeps >= 2 users so joins
have something to do) while making every "plenty of rows" assumption false.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE_SF = "/root/testdata/sf0.001"

# deterministic head-slice sizes; dims stay whole (they are tiny already
# and several fixtures enumerate them: placement regions, dq FK checks)
_HEADS = {
    "customer": 8,
    "supplier": 4,
    "part": 6,
    "orders": 12,
    "events": 24,
    "documents": 6,
    "embeddings": 12,
}


def build_degenerate_dir(out_dir: str, base_sf: str = BASE_SF) -> str:
    os.makedirs(out_dir, exist_ok=True)

    for t in ("region", "nation"):
        schema = pq.read_schema(f"{base_sf}/{t}.parquet")
        df = pd.read_parquet(f"{base_sf}/{t}.parquet")
        pq.write_table(
            pa.Table.from_pandas(df, schema=schema, preserve_index=False),
            f"{out_dir}/{t}.parquet",
        )

    sampled = {}
    for t, n in _HEADS.items():
        df = pd.read_parquet(f"{base_sf}/{t}.parquet").head(n).copy()
        sampled[t] = df

    # lineitem: exactly the children of the sampled orders — entity-consistent
    # (fk_joint_sample / dq_audit read the relationship), still tiny
    li = pd.read_parquet(f"{base_sf}/lineitem.parquet")
    keys = set(sampled["orders"]["o_orderkey"].tolist())
    sampled["lineitem"] = li[li["l_orderkey"].isin(keys)].copy()

    for t, df in sampled.items():
        schema = pq.read_schema(f"{base_sf}/{t}.parquet")
        pq.write_table(
            pa.Table.from_pandas(df, schema=schema, preserve_index=False),
            f"{out_dir}/{t}.parquet",
        )
    return out_dir
