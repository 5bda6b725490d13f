"""Cardinality-skew corpus (r9 verdict ask #3): the same ten tables as the
driver's testdata, derived deterministically from sf0.001, with hostile
CARDINALITY instead of hostile content — the 100 TB failure mode the brief
keeps asking about (skewed shuffle keys, one-reducer walls):

- events: ONE user holds ~30% of all events (hot session/window/chat key)
  and ~40% of events share one event_type (hot topic for the presence /
  message derivations that key topics on event_type);
- orders: ONE customer holds ~30% of orders (hot join/agg key for the
  billable / CDC-payload / customer-join shapes);
- lineitem: ONE (suppkey, partkey) pair holds ~30% of line items (hot
  TPC-H q9/q21-style multi-join key);
- documents: ONE text is shared by ~20% of docs (a giant exact-duplicate
  cluster — the hot component for dedup clustering and one overfull LSH
  band bucket);
- embeddings: ~50% of vectors sit in a tight ball around one anchor, so
  ONE IVF cluster holds half the corpus (hot centroid_id join key for
  semdedup / sem_decontaminate / IVF top-k).

Everything stays inside the data-model contracts (unique event/doc/order
ids, valid enum values, n_chars == length(text), float32 embedding dims) —
the point is hostile KEY DISTRIBUTION, not schema violations. Oracle
comparisons stay engine-exact because both sides read the same parquet;
what this corpus tests is that every operator still terminates at a sane
wall with a single dominant key, and that ties introduced by mass
duplication are broken deterministically on both engines.

`tests/test_oracle_skew.py` runs a curated skew-sensitive subset by
default and the full matrix behind SPARK_GRAFT_SKEW_TEST=1.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from tests.stress_corpus import _write

BASE_SF = "/root/testdata/sf0.001"


def build_skew_dir(out_dir: str, base_sf: str = BASE_SF) -> str:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(11)

    def base(t):
        return pd.read_parquet(f"{base_sf}/{t}.parquet")

    # dims copied verbatim
    for t in ("region", "nation", "customer", "supplier", "part"):
        _write(base(t), f"{base_sf}/{t}.parquet", f"{out_dir}/{t}.parquet")

    # events: hot user (~30% of rows) + hot event_type (~40% of rows).
    # Deterministic row choice; ts/event_id/props untouched, so the hot
    # user's events span the whole time range — giant gap-sessions, giant
    # chat threads, one heavy window partition.
    e = base("events").copy()
    n = len(e)
    hot_user = int(e["user_id"].iloc[0])
    take_user = e.index[(np.arange(n) * 7919) % 10 < 3]  # ~30%
    e.loc[take_user, "user_id"] = hot_user
    hot_type = "click"
    take_type = e.index[(np.arange(n) * 104729) % 10 < 4]  # ~40%
    e.loc[take_type, "event_type"] = hot_type
    _write(e, f"{base_sf}/events.parquet", f"{out_dir}/events.parquet")

    # orders: hot customer (~30% of orders). o_orderkey (the message id /
    # topic modulus source) stays untouched and unique.
    o = base("orders").copy()
    hot_cust = int(o["o_custkey"].iloc[0])
    take = o.index[(np.arange(len(o)) * 6131) % 10 < 3]
    o.loc[take, "o_custkey"] = hot_cust
    _write(o, f"{base_sf}/orders.parquet", f"{out_dir}/orders.parquet")

    # lineitem: hot (suppkey, partkey) on ~30% of rows — FK targets exist;
    # order keys / line numbers untouched
    li = base("lineitem").copy()
    hot_supp = int(li["l_suppkey"].iloc[0])
    hot_part = int(li["l_partkey"].iloc[0])
    take = li.index[(np.arange(len(li)) * 4391) % 10 < 3]
    li.loc[take, "l_suppkey"] = hot_supp
    li.loc[take, "l_partkey"] = hot_part
    _write(li, f"{base_sf}/lineitem.parquet", f"{out_dir}/lineitem.parquet")

    # documents: one giant exact-duplicate cluster (~20% of docs share one
    # text). doc_ids stay unique; n_chars recomputed to keep the invariant.
    d = base("documents").copy()
    nd = len(d)
    mega = "the quick brown fox jumps over the lazy dog again and again"
    take = d.index[(np.arange(nd) * 2477) % 10 < 2]
    d.loc[take, "text"] = mega
    d["n_chars"] = d["text"].str.len().astype("int64")
    _write(d, f"{base_sf}/documents.parquet", f"{out_dir}/documents.parquet")

    # embeddings: ~50% of vectors in a tight ball (radius ~1e-3) around one
    # anchor — whatever centroid set a query selects, the anchor's nearest
    # centroid inherits half the corpus. Tiny deterministic noise keeps the
    # vectors distinct (no accidental exact-dup top-k ties beyond the ones
    # the stress corpus already owns).
    em = base("embeddings").copy()
    ne = len(em)
    anchor = np.asarray(em["embedding"].iloc[3], dtype=np.float32)
    dim = len(anchor)
    # centroid-lattice rows (vec_id % 50 == 0 covers the %100 predicate the
    # IVF queries use too) keep their ORIGINAL vectors: if centroids
    # themselves landed inside the ball, the near-identical centroids would
    # split the hot cluster back into balanced shards and defeat the skew
    vid = em["vec_id"].to_numpy()
    take = [i for i in range(ne) if (i * 3571) % 10 < 5 and vid[i] % 50 != 0]
    noise = rng.normal(0.0, 1e-3, size=(len(take), dim)).astype(np.float32)
    for j, i in enumerate(take):
        em.at[em.index[i], "embedding"] = (anchor + noise[j]).astype(np.float32)
    _write(em, f"{base_sf}/embeddings.parquet", f"{out_dir}/embeddings.parquet")

    return out_dir
