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
    # execute FIRST: under AQE the pre-execution explain is the
    # isFinalPlan=false initial plan — codegen spans are absent and
    # runtime join conversions (the exact regressions this audit exists
    # to catch) are invisible until the query has actually run
    # must be collect() on THIS DataFrame: a write/count spins up its own
    # QueryExecution, leaving df's cached one (the one explain() prints)
    # un-executed and still isFinalPlan=false
    df.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    fb = io.StringIO()
    with redirect_stdout(fb):
        df.explain()  # simple mode carries the *(N) codegen markers
    return buf.getvalue(), fb.getvalue()


_MARKS = (
    (r"BroadcastHashJoin", "broadcast-hash-join"),
    (r"BroadcastNestedLoopJoin", "broadcast-nested-loop-join"),
    (r"SortMergeJoin", "SORT-MERGE-JOIN"),
    (r"ShuffledHashJoin", "shuffled-hash-join"),
    # shuffle exchanges only: a bare substring count would also match
    # BroadcastExchange/ReusedExchange and report nonzero "shuffles" for a
    # pure-broadcast (zero-shuffle) plan
    (r"(?<!Broadcast)(?<!Reused)Exchange", "exchange"),
    (r"InMemoryTableScan", "cached-scan"),
)


def _top_level_fields(schema: str) -> int:
    """Count top-level struct fields: commas inside nested map<>/array<>/
    struct<> type arguments must not count."""
    depth, n = 0, 1 if schema else 0
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            n += 1
    return n


def audit_plan(name: str, df) -> dict:
    text, simple = _plan_text(df)
    # the post-AQE formatted explain appends the pre-adaptive subtree
    # under "== Initial Plan ==": count operators only in the FINAL tree
    # above it, but keep the full text for the per-operator details
    # (PushedFilters/ReadSchema live below the marker)
    cut = text.find("== Initial Plan ==")
    tree = text[:cut] if cut != -1 else text
    # marks from the formatted plan only (one occurrence per operator);
    # codegen spans from the simple plan, which is where *(N) appears
    counts = {label: len(re.findall(mark, tree)) for mark, label in _MARKS}
    counts["codegen-spans"] = len(set(re.findall(r"\*\((\d+)\)", simple)))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    # non-greedy to end of line: the schema may contain nested '>'
    schemas = re.findall(r"ReadSchema: struct<(.*)>", text)
    return {
        "name": name,
        # zero-valued counts stay in the report: "codegen-spans: 0" IS the
        # regression signal, and omitting the key reads as not-applicable
        **counts,
        "pushed_filters": sorted({p for p in pushed if p}),
        "scan_columns": [_top_level_fields(s) for s in schemas],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    from realtime_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("plan_audit", cpus=4)
    qs = entry_mod.queries()
    # default: every registered query — a hard-coded list silently skips
    # newly added queries from the audit
    names = sys.argv[2:] or sorted(qs)
    for name in names:
        if name not in qs:
            print(f"{name}: NOT FOUND")
            continue
        info = audit_plan(name, qs[name](spark, sf_dir))
        print(info)


if __name__ == "__main__":
    main()
