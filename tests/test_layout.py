"""Z-order layout: the pruning claim, not just the key math.

The oracle query (zorder_orders) pins the Morton key bit-for-bit; these
tests verify the part SQL can't express — that writing the corpus Z-ordered
actually makes per-file min/max stats prune a 2-D box predicate, and that
pruning is SAFE (every matching row lives in a matched file).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from realtime_spark.operators.layout import (
    file_manifest,
    files_matching,
    write_zordered,
    zorder_keys,
)
from realtime_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.01"
N_FILES = 16
COLS = ["o_custkey", "o_totalprice"]
# a box selective on BOTH dimensions (~1/16 of each value range)
BOUNDS = {"o_custkey": (100.0, 1000.0), "o_totalprice": (10_000.0, 30_000.0)}


@pytest.fixture(scope="module")
def layouts(spark):
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", *COLS)
    zdir = tempfile.mkdtemp(prefix="zorder_")
    sdir = tempfile.mkdtemp(prefix="singlesort_")
    write_zordered(o, zdir, COLS, n_files=N_FILES)
    # baseline layout: same file count, clustered on ONE column only
    o.repartitionByRange(N_FILES, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.mode("overwrite").parquet(sdir)
    yield spark.read.parquet(zdir), spark.read.parquet(sdir)
    shutil.rmtree(zdir, ignore_errors=True)
    shutil.rmtree(sdir, ignore_errors=True)


def _n_matched(df):
    m = file_manifest(df, COLS)
    return m.count(), files_matching(m, BOUNDS).count()


class TestZorderPruning:
    def test_prunes_most_files(self, layouts):
        zdf, _ = layouts
        total, matched = _n_matched(zdf)
        assert total == N_FILES
        # a 2-D-selective box must touch well under half the z-ordered files
        assert matched <= total // 2, (matched, total)

    def test_beats_single_column_sort_on_secondary_dim(self, layouts):
        zdf, sdf = layouts
        _, z_matched = _n_matched(zdf)
        _, s_matched = _n_matched(sdf)
        # single-column sort prunes on o_custkey but its files span the full
        # o_totalprice range; z-order must touch no more files than it
        assert z_matched <= s_matched, (z_matched, s_matched)

    def test_pruning_is_safe(self, layouts, spark):
        zdf, _ = layouts
        m = file_manifest(zdf, COLS)
        kept = [r["file"] for r in files_matching(m, BOUNDS).collect()]
        pred = (
            F.col("o_custkey").between(*BOUNDS["o_custkey"])
            & F.col("o_totalprice").between(*BOUNDS["o_totalprice"])
        )
        all_hits = zdf.filter(pred).count()
        kept_hits = (
            spark.read.parquet(*[f.replace("file://", "") for f in kept])
            .filter(pred)
            .count()
        )
        assert all_hits == kept_hits and all_hits > 0

    def test_z_is_deterministic(self, layouts, spark):
        o = load_table(spark, SF_DIR, "orders")
        a = zorder_keys(o, COLS).select("o_orderkey", "z")
        b = zorder_keys(o.repartition(7), COLS).select("o_orderkey", "z")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
