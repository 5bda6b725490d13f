"""Bucketed co-located join: the 100 TB strategy for recurring big-big
equi-joins (orders |><| lineitem class). Writing both sides bucketed on the
join key lets every future join run shuffle-FREE — each task reads matching
bucket files from both tables; only a cheap in-partition sort remains.

This is the on-disk layout decision SURVEY's scale notes prescribe for
repeated fact-fact joins; the plan assertion (zero Exchange, Bucketed scan)
is the contract."""

from __future__ import annotations

import io
import os
import tempfile
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark):
    spark.sql("DROP TABLE IF EXISTS _bkt_orders")
    spark.sql("DROP TABLE IF EXISTS _bkt_lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with tempfile.TemporaryDirectory() as d:
            o = spark.range(5000).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
            )
            l = spark.range(20000).select(
                (F.col("id") % 5000).alias("k"), F.col("id").alias("v2")
            )
            o.write.bucketBy(8, "k").sortBy("k").option(
                "path", os.path.join(d, "o")
            ).saveAsTable("_bkt_orders")
            l.write.bucketBy(8, "k").sortBy("k").option(
                "path", os.path.join(d, "l")
            ).saveAsTable("_bkt_lineitem")

            j = spark.table("_bkt_orders").join(spark.table("_bkt_lineitem"), "k")
            p = _plan(j)
            assert "Exchange" not in p, f"bucketed join shuffled:\n{p}"
            assert "Bucketed: true" in p, p
            assert j.count() == 20000

            # contrast: the same join over unbucketed frames DOES shuffle
            p2 = _plan(o.join(l, "k"))
            assert "Exchange" in p2
    finally:
        spark.sql("DROP TABLE IF EXISTS _bkt_orders")
        spark.sql("DROP TABLE IF EXISTS _bkt_lineitem")
        # conf.get(key, None) returns None when the key was never EXPLICITLY
        # set (even though Spark has a built-in default), so a conditional
        # restore leaked threshold=-1 into every later test in the session —
        # unset() restores the built-in default in that case
        if prev is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        else:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
