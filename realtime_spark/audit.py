"""Plan audit CLI: prints the physical-plan properties that matter at scale
for each headline query — join strategy, exchanges (shuffles), parquet
pushdown/pruning, codegen coverage.

    python -m realtime_spark.audit [sf_dir]

Use after changing an operator: the right plan, not just a passing test, is
the acceptance bar (a BroadcastHashJoin that silently became a
SortMergeJoin, or a scan that stopped pruning columns, is a regression even
when results match).
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout


def _plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
        df.explain()  # simple mode carries the [codegen id : N] markers
    return buf.getvalue()


_MARKS = (
    ("BroadcastHashJoin", "broadcast-hash-join"),
    ("BroadcastNestedLoopJoin", "broadcast-nested-loop-join"),
    ("SortMergeJoin", "SORT-MERGE-JOIN"),
    ("ShuffledHashJoin", "shuffled-hash-join"),
    ("Exchange", "exchange"),
    ("InMemoryTableScan", "cached-scan"),
)


def audit_plan(name: str, df) -> dict:
    text = _plan_text(df)
    counts = {label: text.count(mark) for mark, label in _MARKS}
    counts["codegen-spans"] = len(set(re.findall(r"\*\((\d+)\)", text)))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", text)
    return {
        "name": name,
        **{k: v for k, v in counts.items() if v},
        "pushed_filters": sorted({p for p in pushed if p}),
        "scan_columns": [len(s.split(",")) for s in schemas],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    from realtime_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("plan_audit", cpus=4)
    qs = entry_mod.queries()
    names = sys.argv[2:] or [
        "cdc_multi_pairs",
        "cdc_subscription_ids",
        "replay_topk",
        "rate_sliding_60s",
        "dedup_minhash_lsh",
        "dedup_jaccard",
        "ann_brute_topk",
        "ann_ivf_topk",
        "node_routing",
        "corpus_clean_pipeline",
        "decontaminate",
        "lsh_jaccard_pipeline",
        "srp_cosine_pipeline",
        "sample_per_group",
        "cdc_materialize",
        "search_bm25",
        "funnel_stages",
        "retention_cohorts",
        "corpus_percentiles",
        "tpch_q1",
        "tpch_q3",
        "tpch_q5",
        "semdedup",
        "span_dup_stats",
        "dsir_weights",
        "dedup_lsh_index",
        "stream_interval_join",
        "gopher_rules",
        "ann_hard_negatives",
        "hll_users",
        "cdc_compact",
        "cdc_snapshot_asof",
        "ann_sq_topk",
        "ann_sq_rerank",
        "chunk_windows",
        "fk_joint_sample",
        "zorder_orders",
        "sample_weighted",
        "url_domains",
        "corpus_diff",
        "cdc_gap_audit",
        "cdc_schema_drift",
        "event_transitions",
        "markov_stationary",
        "ols_trend",
        "cusum_changepoint",
        "hist_quantiles",
        "phrase_search",
        "hash_embed_retrieval",
        "ngram_novelty",
        "quality_classifier",
        "robust_spikes",
        "session_transitions",
        "dup_graph_triangles",
        "search_bm25_index",
        "dq_audit",
        "ann_recall_sweep",
        "k_anonymity",
        "cdc_pk_change",
    ]
    for name in names:
        if name not in qs:
            print(f"{name}: NOT FOUND")
            continue
        info = audit_plan(name, qs[name](spark, sf_dir))
        print(info)


if __name__ == "__main__":
    main()
