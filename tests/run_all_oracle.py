"""Local full-matrix oracle runner replicating the driver's correctness pass:
runs EVERY queries() entry against its oracle_sql() at sf0.01 with per-query
error capture, so no driver-side crash can truncate the grading again.

Usage: python tests/run_all_oracle.py [sf_dir] [name_filter_substr]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from realtime_spark.session import get_spark  # noqa: E402
from realtime_spark.sources.testdata import TABLES  # noqa: E402


def _norm(v):
    if v is None:
        return None
    # float vs int must stay DISTINCT (driver hashes "123.0" != "123"):
    # DuckDB SUM(BIGINT) -> HUGEINT -> pandas float64 while Spark keeps
    # bigint; tuple equality (123.0 == 123) would hide that, so tag floats.
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # + 0.0 folds -0.0: engines may disagree on the SIGN of a zero
        # (summation-order noise rounded to zero), which is equal under ==
        # but sorts/reprs differently and would misalign the row zip
        return ("f", round(v, 9) + 0.0)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon_frame(df):
    """Vectorized canonicalization mirroring _norm: per-dtype string
    encoding (floats round-9 with an 'f:' tag and negative-zero folded,
    ints/bools/datetimes via astype(str), everything else through the
    row-wise _norm) then a whole-frame sort. Two frames are value-equal
    iff their canon frames are equal — used as a FAST-ACCEPT only: any
    disagreement re-checks with the exact row-wise path, so a
    canonicalization corner (e.g. Decimal scale) can never fail a query
    that the exact compare would pass."""
    import numpy as np
    import pandas as pd

    cols = {}
    for c in sorted(df.columns):
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            r = s.round(9) + 0.0  # fold -0.0
            cols[c] = pd.Series(
                np.where(s.isna(), "nan", "f:" + r.astype(str)), index=s.index
            )
        elif pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
            cols[c] = s.astype(str)
        elif pd.api.types.is_datetime64_any_dtype(s):
            cols[c] = s.astype(str)
        else:
            cols[c] = s.map(lambda v: repr(_norm(v)))
    out = pd.DataFrame(cols)
    return out.sort_values(
        by=list(out.columns), kind="mergesort", ignore_index=True
    )


_FAST_COMPARE_MIN_ROWS = 50_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as em

    spark = get_spark(
        "oracle_all", cpus=int(os.environ.get("SPARK_GRAFT_ORACLE_CPUS", "16"))
    )
    con = duckdb.connect()
    # Bound this process's DuckDB so one spill-heavy oracle (e.g. a recursive
    # closure over a pair graph at sf1) fails ALONE instead of filling the
    # disk and killing every concurrent shard's Spark JVM — the failure mode
    # of the first sharded sf1 attempt. Both knobs env-overridable.
    con.execute(
        "SET memory_limit = "
        f"'{os.environ.get('SPARK_GRAFT_DUCKDB_MEM', '24GiB')}'"
    )
    tmp = f"/tmp/duckdb_spill_{os.getpid()}"
    con.execute(f"SET temp_directory = '{tmp}'")
    con.execute(
        "SET max_temp_directory_size = "
        f"'{os.environ.get('SPARK_GRAFT_DUCKDB_SPILL_CAP', '24GiB')}'"
    )
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = em.queries()
    oracles = em.oracle_sql()
    orphan_oracles = sorted(set(oracles) - set(qs))
    if orphan_oracles:
        print(f"WARN: oracles with no matching query: {orphan_oracles}", flush=True)
    missing_oracles = sorted(set(qs) - set(oracles))
    if missing_oracles:
        print(f"NOTE: rows-only queries (no oracle): {missing_oracles}", flush=True)
    # optional N-way sharding for big one-time gates (e.g. sf1): set
    # SPARK_GRAFT_SHARD=k/N to run only the queries whose index in the
    # SORTED name list is congruent to k mod N, and bound this process's
    # DuckDB threads so N shards share the box
    shard = os.environ.get("SPARK_GRAFT_SHARD", "")
    if shard:
        k, n = (int(p) for p in shard.split("/"))
        names = sorted(qs)
        keep = {nm for i, nm in enumerate(names) if i % n == k}
        qs = {nm: qs[nm] for nm in qs if nm in keep}
        con.execute(f"SET threads = {max(4, 32 // n)}")
        print(f"shard {k}/{n}: {len(qs)} queries", flush=True)
    # resume support for the big one-time gates: SPARK_GRAFT_SKIP_OK_LOGS is
    # a colon-separated list of PRIOR runner logs; any query already printed
    # green there ("ok <name> rows=" / "ok(rows-only) <name>") is skipped, so
    # an interrupted multi-hour shard restarts from where it died
    # explicit exclusions for one-time gates: the documented-quadratic
    # baselines (all-pairs semantics with no linear form) are sf0.1-bounded
    # by design; their bucketed scale-path variants still run everywhere
    excl = {
        nm
        for nm in os.environ.get("SPARK_GRAFT_EXCLUDE", "").replace(
            ":", ","
        ).split(",")
        if nm
    }
    if excl:
        hit = sorted(excl & set(qs))
        qs = {nm: f for nm, f in qs.items() if nm not in excl}
        print(f"excluded by SPARK_GRAFT_EXCLUDE: {hit}", flush=True)
    skip_logs = os.environ.get("SPARK_GRAFT_SKIP_OK_LOGS", "")
    if skip_logs:
        import re

        done: set[str] = set()
        for p in skip_logs.split(":"):
            try:
                text = open(p, errors="replace").read()
            except OSError:
                continue
            done.update(re.findall(r"ok(?:\(rows-only\))? (\w+) rows=", text))
        n_before = len(qs)
        qs = {nm: f for nm, f in qs.items() if nm not in done}
        print(f"resume: skipping {n_before - len(qs)} already-green queries", flush=True)

    results: dict[str, dict] = {}
    t_all = time.time()
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        rec: dict = {}
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
        except Exception:
            rec["err"] = "spark: " + traceback.format_exc().splitlines()[-1]
            results[name] = rec
            print(f"FAIL(spark) {name}: {rec['err']}", flush=True)
            continue
        if name not in oracles:
            rec["rows_only"] = True
            results[name] = rec
            print(f"ok(rows-only) {name} rows={len(sdf)} {time.time()-t0:.1f}s", flush=True)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            rec["err"] = "oracle: " + traceback.format_exc().splitlines()[-1]
            results[name] = rec
            print(f"FAIL(oracle) {name}: {rec['err']}", flush=True)
            continue
        rec["oracle_rows"] = len(odf)
        rec["rows_match"] = len(sdf) == len(odf)
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        rec["schema_match"] = s_cols == o_cols
        hash_match = False
        if (
            rec["rows_match"]
            and rec["schema_match"]
            and len(sdf) >= _FAST_COMPARE_MIN_ROWS
        ):
            # vectorized fast-accept; fall through to the exact row-wise
            # compare only when the canon frames disagree
            hash_match = _canon_frame(sdf[s_cols]).equals(_canon_frame(odf[o_cols]))
            if hash_match:
                rec["hash_match"] = True
                results[name] = rec
                print(
                    f"ok {name} rows={len(sdf)}/{len(odf)} "
                    f"cols={rec['schema_match']} {time.time()-t0:.1f}s (fast)",
                    flush=True,
                )
                continue
        if rec["rows_match"] and rec["schema_match"]:
            s_rows = sorted(
                (tuple(_norm(v) for v in r) for r in sdf[s_cols].itertuples(index=False)),
                key=repr,
            )
            o_rows = sorted(
                (tuple(_norm(v) for v in r) for r in odf[o_cols].itertuples(index=False)),
                key=repr,
            )
            hash_match = s_rows == o_rows
            if not hash_match:
                bad = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:2]
                rec["first_diff"] = repr(bad)[:500]
        rec["hash_match"] = hash_match
        results[name] = rec
        status = "ok" if hash_match else "MISMATCH"
        print(
            f"{status} {name} rows={len(sdf)}/{len(odf)} cols={rec['schema_match']} "
            f"{time.time()-t0:.1f}s",
            flush=True,
        )

    n_ok = sum(1 for r in results.values() if r.get("hash_match") or r.get("rows_only"))
    print(f"\n{n_ok}/{len(results)} pass in {time.time()-t_all:.0f}s")
    bad = {k: v for k, v in results.items() if not (v.get("hash_match") or v.get("rows_only"))}
    if bad:
        print(json.dumps(bad, indent=1, default=str))


if __name__ == "__main__":
    main()
