"""Generate an sf1-scale corpus as a deterministic 10x scale-up of the
driver's sf0.1 testdata (r9 verdict ask #4: the third-decade oracle run —
/root/testdata has no sf1, so this is the documented equivalent).

Replication scheme (replica r in 0..9; r=0 is the original rows verbatim):
- every key column shifts by r * <table row count> (dense 0..N-1 ids, so
  replicas tile disjoint key ranges and FK edges stay consistent:
  orders.o_custkey -> replica customer, lineitem -> replica order/part/
  supplier, events.user_id -> replica user id space);
- customer/supplier names are regenerated as 'Customer#%09d' of the new
  key, preserving the trailing-digit contract record linkage relies on;
- document text gets a replica-unique token injected every 3 words: two
  in-replica duplicates stay exact duplicates (the token depends only on
  r), while every 8-gram shingle of every replica contains the token, so
  cross-replica MinHash/span similarity collapses to ~0 — the planted dup
  structure replicates once per replica instead of exploding into
  10-way near-dup cliques that would square the LSH candidate volume;
- embeddings are transformed by a per-replica deterministic sign-flip
  pattern: norms, component distributions, in-replica exact-dup ties and
  the vec_id%50 centroid lattice are all preserved, while cross-replica
  cosines drop to ~0 (no 10x semantic-dup cliques);
- region/nation are fixed dims, copied verbatim.

Timestamps are NOT shifted: 10x the events in the same 30-day window is
exactly the densification a 10x scale-up of one tenant's month looks like.

Usage:  python -m tests.gen_sf1 [out_dir]   (default /tmp/spark_graft_sf1)
Then:   SPARK_GRAFT_ORACLE_SF_DIR=<out_dir> python -m pytest tests/test_oracle.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

from tests.stress_corpus import _write

BASE_SF = "/root/testdata/sf0.1"
REPLICAS = 10


def _tile(df: pd.DataFrame, shifts: dict[str, int]) -> pd.DataFrame:
    out = []
    for r in range(REPLICAS):
        d = df.copy()
        for col, per in shifts.items():
            d[col] = d[col] + r * per
        out.append(d)
    return pd.concat(out, ignore_index=True)


def build_sf1_dir(out_dir: str = "/tmp/spark_graft_sf1", base_sf: str = BASE_SF) -> str:
    os.makedirs(out_dir, exist_ok=True)

    def base(t):
        return pd.read_parquet(f"{base_sf}/{t}.parquet")

    def write(df, t):
        _write(df, f"{base_sf}/{t}.parquet", f"{out_dir}/{t}.parquet")

    for t in ("region", "nation"):
        write(base(t), t)

    c = base("customer")
    nc = len(c)
    c10 = _tile(c, {"c_custkey": nc})
    c10["c_name"] = "Customer#" + c10["c_custkey"].astype(int).astype(str).str.zfill(9)
    write(c10, "customer")

    s = base("supplier")
    ns = len(s)
    s10 = _tile(s, {"s_suppkey": ns})
    s10["s_name"] = "Supplier#" + s10["s_suppkey"].astype(int).astype(str).str.zfill(9)
    write(s10, "supplier")

    p = base("part")
    npart = len(p)
    write(_tile(p, {"p_partkey": npart}), "part")

    o = base("orders")
    no = len(o)
    write(_tile(o, {"o_orderkey": no, "o_custkey": nc}), "orders")

    li = base("lineitem")
    write(
        _tile(li, {"l_orderkey": no, "l_partkey": npart, "l_suppkey": ns}),
        "lineitem",
    )

    e = base("events")
    ne = len(e)
    nu = int(e["user_id"].max()) + 1
    write(_tile(e, {"event_id": ne, "user_id": nu}), "events")

    d = base("documents")
    nd = len(d)
    reps = []
    for r in range(REPLICAS):
        dr = d.copy()
        dr["doc_id"] = dr["doc_id"] + r * nd
        if r > 0:
            tok = f"zrep{r}q"  # replica-constant -> in-replica dups survive
            dr["text"] = dr["text"].map(
                lambda t, tok=tok: " ".join(
                    w if (i + 1) % 3 else f"{w} {tok}"
                    for i, w in enumerate(str(t).split(" "))
                )
            )
        reps.append(dr)
    d10 = pd.concat(reps, ignore_index=True)
    d10["n_chars"] = d10["text"].str.len().astype("int64")
    write(d10, "documents")

    em = base("embeddings")
    nv = len(em)
    dim = len(em["embedding"].iloc[0])
    reps = []
    for r in range(REPLICAS):
        er = em.copy()
        er["vec_id"] = er["vec_id"] + r * nv
        if r > 0:
            # deterministic +/-1 pattern per (replica, component): norms and
            # in-replica structure preserved, cross-replica cosine ~0
            signs = np.where(
                ((np.arange(dim) * 2654435761 + r * 40503) >> 3) % 2 == 0,
                np.float32(1.0),
                np.float32(-1.0),
            )
            er["embedding"] = er["embedding"].map(
                lambda v, s=signs: (np.asarray(v, dtype=np.float32) * s)
            )
        reps.append(er)
    write(pd.concat(reps, ignore_index=True), "embeddings")

    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    print(build_sf1_dir(out))
