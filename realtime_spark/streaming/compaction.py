"""Epoch compaction for the streaming ingest stores.

The three streaming ingest jobs (ingest.py, vector_ingest.py,
search_ingest.py) append one ``ingest_epoch=e{N}`` partition directory per
micro-batch, forever. That is the correct exactly-once write protocol, but
at thousands of epochs file-listing cost, per-epoch stat-fold cost, and
small-file counts all grow linearly — the same run-forever hazard the
reference solves for its message store with partition GC
(/root/reference/lib/realtime/messages.ex:72-102 drops whole day
partitions). This module is the ingest-store analog: fold every committed
epoch into one compacted base partition, without ever corrupting a reader.

Layout and protocol
-------------------

Each store keeps its flat hive layout (``<store>/ingest_epoch=<tag>/``);
compaction adds one small JSON *manifest* (``<store>/_compaction.json`` —
the underscore prefix makes Spark's parquet reader ignore it) that names
what is visible:

    {"base": "c3", "min_epoch": 17, "generation": 3}

Visible data = the ``ingest_epoch=c3`` base partition plus every
``ingest_epoch=e{N}`` with N >= 17. No manifest means everything is
visible (the pre-compaction layout, unchanged). ``read_store`` applies
this as a partition-column filter, so pruning still happens at planning
time and orphaned directories are never scanned.

``compact_store`` is stage-then-swap with the manifest replace as the ONE
commit point (the publish.py pointer discipline, operators/publish.py:100):

    1. stage the fold into ``<store>/_staging_c{G}`` (invisible to Spark)
    2. rename it to ``ingest_epoch=c{G}``     (invisible: not in manifest)
    3. atomically replace the manifest        <- the commit
    4. GC the folded base + epoch directories (orphans if we crash first)

A crash before (3) leaves the old manifest pointing at the old data —
re-running compaction cleans the stale staging/c{G} dirs and starts over.
A crash after (3) leaves folded directories behind as orphans that every
manifest-aware reader ignores; the next compaction (or `gc_store`) removes
them. At no point does a reader see doubled or missing rows.

Contract: run compaction while the ingest stream is STOPPED after a clean
drain (the streaming jobs' availableNow mode). A replayed epoch that was
folded mid-flight could otherwise be half-captured. This mirrors how the
reference schedules its partition GC as a periodic job, not inside the
write path. Paths are manipulated with os/shutil — single-filesystem
semantics (local/NFS/fuse); an object-store deployment would swap the two
rename calls for its atomic-commit primitive.

Equivalence guarantee (asserted by tests/test_compaction.py): probe,
search, and BM25 results off the store are bit-identical before and after
compaction, and ingest can continue appending epochs afterwards (the
manifest's min_epoch admits every epoch id above the folded range).
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_compaction.json"


def _manifest_path(store: str) -> str:
    return os.path.join(store, _MANIFEST)


def read_manifest(store: str) -> dict | None:
    try:
        with open(_manifest_path(store)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _visible_cond(manifest: dict | None) -> Column:
    if manifest is None:
        return F.lit(True)
    epoch_num = F.expr("try_cast(substring(ingest_epoch, 2, 18) AS bigint)")
    return (F.col("ingest_epoch") == manifest["base"]) | (
        F.col("ingest_epoch").startswith("e")
        & (epoch_num >= int(manifest["min_epoch"]))
    )


def read_store(spark: SparkSession, store: str) -> DataFrame:
    """Manifest-aware read of one ingest store: the compacted base plus
    every epoch at or above min_epoch. The predicate is on the partition
    column only — it prunes at planning time and never scans orphans."""
    return spark.read.parquet(store).filter(_visible_cond(read_manifest(store)))


class EpochRewindError(RuntimeError):
    """A micro-batch arrived with an epoch id below a compacted store's
    ``min_epoch``. Epoch ids come from the streaming checkpoint; after a
    compaction folded epochs [0..N] the manifest admits only e{N+1}+, so a
    restart against a FRESH checkpoint (batch ids restart at 0) would write
    partitions the manifest silently hides — every read and every dedup
    anti-join would stop seeing newly accepted rows with no error anywhere.
    Fail loudly at write time instead. The reference's replication protocol
    enforces the same monotonicity by acking a monotone ``wal_end`` so a
    slot can never silently rewind
    (/root/reference/lib/realtime/tenants/replication_connection.ex:349-356).
    Recovery: resume with the original checkpoint directory, or re-seed the
    store root if the checkpoint is genuinely lost."""


def assert_epoch_admissible(epoch_id: int, *stores: str) -> None:
    """Write-time guard for the streaming batch bodies: raise
    ``EpochRewindError`` if any of the batch's target stores has a
    compaction manifest whose ``min_epoch`` exceeds ``epoch_id``. Called
    before any store read so a rewound replay cannot even self-dedup
    against a read set it does not match."""
    for store in stores:
        manifest = read_manifest(store)
        if manifest is not None and int(epoch_id) < int(manifest["min_epoch"]):
            raise EpochRewindError(
                f"epoch {epoch_id} is below min_epoch "
                f"{manifest['min_epoch']} of compacted store {store!r} "
                f"(generation {manifest['generation']}): the write would be "
                "permanently invisible. This happens when an ingest stream "
                "restarts with a fresh checkpoint after a compaction — "
                "resume with the original checkpoint, or re-seed the store."
            )


def _epoch_dirs(store: str) -> list[str]:
    """Data partition directory names present on disk (tags, not paths)."""
    out = []
    for name in sorted(os.listdir(store)):
        if name.startswith("ingest_epoch=") and os.path.isdir(
            os.path.join(store, name)
        ):
            out.append(name.split("=", 1)[1])
    return out


def _visible_tags(store: str, manifest: dict | None) -> list[str]:
    tags = _epoch_dirs(store)
    if manifest is None:
        return tags
    mn = int(manifest["min_epoch"])
    keep = []
    for t in tags:
        if t == manifest["base"]:
            keep.append(t)
        elif t.startswith("e"):
            try:
                if int(t[1:]) >= mn:
                    keep.append(t)
            except ValueError:
                pass
    return keep


def gc_store(store: str) -> list[str]:
    """Remove stale staging directories and orphaned data directories that
    the manifest does not admit (crash leftovers). Safe to run any time the
    ingest stream is stopped; no-op without a manifest."""
    removed = []
    for name in sorted(os.listdir(store)):
        if name.startswith("_staging_c"):
            shutil.rmtree(os.path.join(store, name), ignore_errors=True)
            removed.append(name)
    manifest = read_manifest(store)
    if manifest is None:
        return removed
    visible = set(_visible_tags(store, manifest))
    for t in _epoch_dirs(store):
        if t not in visible:
            shutil.rmtree(os.path.join(store, f"ingest_epoch={t}"))
            removed.append(f"ingest_epoch={t}")
    return removed


_RESERVED_KEYS = ("base", "min_epoch", "generation", "folded")


def compact_store(
    spark: SparkSession,
    store: str,
    write_fold: Callable[[DataFrame, str], None],
    extra_manifest: dict | None = None,
) -> dict:
    """Fold every visible partition of one store into a single compacted
    base. ``write_fold(df, path)`` materializes the folded frame at `path`
    in the store's own layout (sub-partitioning, sorting, stat summing).
    Returns the new manifest. Crash-safe per the module protocol; requires
    the ingest stream writing this store to be stopped.

    ``extra_manifest`` entries are merged into the committed manifest;
    non-reserved keys already present (e.g. the vector store's published
    ``centroids`` pointer) carry forward unless overridden, so a plain
    compaction never un-publishes a rebuild."""
    manifest = read_manifest(store)
    if manifest is None:
        # install an explicit everything-visible manifest BEFORE any
        # directory appears under a c-name: without it, a gen-0 crash
        # between the rename and the commit would leave ingest_epoch=c0
        # visible to manifest-less readers (doubled rows). The three
        # pipelines only ever write the tags 'seed' and 'e{N}', so
        # {base: seed, min_epoch: 0} is byte-equivalent to no manifest.
        manifest = {"base": "seed", "min_epoch": 0, "generation": -1}
        tmp0 = _manifest_path(store) + ".tmp"
        with open(tmp0, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp0, _manifest_path(store))
    gen = int(manifest["generation"]) + 1
    tags = _visible_tags(store, manifest)
    if not tags:
        raise ValueError(f"nothing to compact under {store!r}")
    max_epoch = max(
        (int(t[1:]) for t in tags if t.startswith("e") and t[1:].isdigit()),
        default=int(manifest["min_epoch"]) - 1,
    )

    # (1) stage: fold exactly the pinned visible set (a concurrent write of
    # a NEWER epoch would not be folded, but the contract is stream-stopped)
    gc_store(store)  # clear stale staging from a previous crash
    staging = os.path.join(store, f"_staging_c{gen}")
    visible = spark.read.parquet(store).filter(
        F.col("ingest_epoch").isin(tags)
    ).drop("ingest_epoch")
    write_fold(visible, staging)

    # (2) reveal the directory under its real name — still invisible to
    # manifest-aware readers (the manifest does not name it yet)
    final = os.path.join(store, f"ingest_epoch=c{gen}")
    if os.path.exists(final):  # crash leftover from an uncommitted attempt
        shutil.rmtree(final)
    os.rename(staging, final)

    # (3) commit: one atomic manifest replace (publish.py:100 discipline)
    new_manifest = {
        **{k: v for k, v in manifest.items() if k not in _RESERVED_KEYS},
        "base": f"c{gen}",
        "min_epoch": max_epoch + 1,
        "generation": gen,
        "folded": tags,
        **(extra_manifest or {}),
    }
    tmp = _manifest_path(store) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(new_manifest, fh)
    os.replace(tmp, _manifest_path(store))

    # (4) GC the folded directories — crash here only leaves ignored orphans
    gc_store(store)
    return new_manifest


# ---------------------------------------------------------------------------
# per-pipeline fold shapes (mirror each store's seed/epoch write layout)
# ---------------------------------------------------------------------------


def _fold_plain(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def _fold_lsh(df: DataFrame, path: str) -> None:
    df.repartition("band").sortWithinPartitions("key").write.mode(
        "overwrite"
    ).partitionBy("band").parquet(path)


def _fold_ivf(df: DataFrame, path: str) -> None:
    df.repartition("centroid_id").write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(path)


def _fold_postings(df: DataFrame, path: str) -> None:
    df.repartition("bucket").sortWithinPartitions("bucket", "term").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)


def _fold_stats(df: DataFrame, path: str) -> None:
    # per-epoch exact-bigint partials sum into ONE base partial — the
    # query-time fold is unchanged and stays bit-identical
    df.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("sum_dl").cast("bigint").alias("sum_dl"),
    ).write.mode("overwrite").parquet(path)


def _maybe_compact(spark, store, fold) -> dict | None:
    """Skip a store that has no directory yet (e.g. `accepted` before the
    first epoch lands on a freshly-seeded root) instead of crashing halfway
    through the trio and leaving the stores at mixed generations."""
    if not os.path.isdir(store):
        return None
    return compact_store(spark, store, fold)


def _store_bytes(root: str, subs: Sequence[str]) -> int:
    total = 0
    for sub in subs:
        for dirpath, _, files in os.walk(os.path.join(root, sub)):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    pass
    return total


def _compact_trio(spark, root: str, items) -> dict:
    """Run one pipeline's substore compactions CONCURRENTLY (r11, guide
    section 2.6): each fold is an independent stage-then-swap on its own
    directory, and at increment scale each is a tiny job that leaves the
    cluster idle — overlapping them back-fills the tails. Shuffles inside
    the folds are sized to the visible store bytes (scale-neutral: a
    corpus-sized store crosses the clamp and keeps every core)."""
    from concurrent.futures import ThreadPoolExecutor

    from realtime_spark.session import (
        scaled_shuffle_partitions,
        scoped_shuffle_partitions,
    )

    n = scaled_shuffle_partitions(
        spark, _store_bytes(root, [sub for _, sub, _ in items])
    )
    with scoped_shuffle_partitions(spark, n):
        with ThreadPoolExecutor(max_workers=len(items)) as pool:
            futs = [
                (name, pool.submit(_maybe_compact, spark, f"{root}/{sub}", fold))
                for name, sub, fold in items
            ]
            return {name: f.result() for name, f in futs}


def compact_ingest_state(spark: SparkSession, root: str) -> dict:
    """Compact the corpus-ingest trio of stores (streaming/ingest.py):
    digests and accepted fold by plain union (rows are disjoint across
    epochs by construction — each epoch anti-joined against all priors),
    the LSH index refolds band-partitioned and key-sorted."""
    return _compact_trio(spark, root, [
        ("digests", "digests", _fold_plain),
        ("lsh", "lsh", _fold_lsh),
        ("accepted", "accepted", _fold_plain),
    ])


def compact_vector_state(spark: SparkSession, root: str) -> dict:
    """Compact the vector-ingest stores (streaming/vector_ingest.py): the
    IVF index refolds centroid-partitioned (probe pruning unchanged);
    accepted ids fold plain. Centroids are not epochal — untouched."""
    return _compact_trio(spark, root, [
        ("ivf", "ivf", _fold_ivf),
        ("accepted", "accepted", _fold_plain),
    ])


def compact_search_state(spark: SparkSession, root: str) -> dict:
    """Compact the search-ingest stores (streaming/search_ingest.py):
    postings refold bucket-partitioned and term-sorted, doc lengths fold
    plain, and the per-epoch stat partials SUM into one base partial —
    exact bigint arithmetic, so folded BM25 scores stay bit-identical."""
    return _compact_trio(spark, root, [
        ("postings", "postings", _fold_postings),
        ("doclen", "doclen", _fold_plain),
        ("stats", "stats", _fold_stats),
    ])


# ---------------------------------------------------------------------------
# scheduled compaction: the run-forever policy
# ---------------------------------------------------------------------------

# substores each pipeline's compactor folds — the trigger scans the same set
INGEST_SUBSTORES = ("digests", "lsh", "accepted")
VECTOR_SUBSTORES = ("ivf", "accepted")
SEARCH_SUBSTORES = ("postings", "doclen", "stats")


def store_epoch_count(store: str) -> int:
    """Uncompacted ``ingest_epoch=e{N}`` directories currently on disk.
    After a compaction + GC only epochs above min_epoch remain, so this is
    the growth since the last fold."""
    if not os.path.isdir(store):
        return 0
    return sum(1 for t in _epoch_dirs(store) if t.startswith("e"))


def store_file_count(store: str) -> int:
    """Data files under one store (the small-file pressure metric)."""
    n = 0
    for _, _, files in os.walk(store):
        n += sum(1 for f in files if not f.startswith((".", "_")))
    return n


def should_compact(
    root: str,
    substores: Sequence[str],
    max_epochs: int = 32,
    max_files: int | None = None,
) -> bool:
    """Threshold trigger for the scheduled policy: fire when any substore
    has accumulated ``max_epochs`` uncompacted epoch directories, or (if
    set) when any substore's data-file count reaches ``max_files``. Both
    are pure directory listings — no Spark job.

    The file-count trigger only fires while there is at least one
    uncompacted epoch to fold: ``store_file_count`` includes the compacted
    base's own files, so once the base alone exceeds ``max_files`` an
    ungated trigger would rewrite the whole base every cycle forever with
    zero new epochs — a full-store rewrite per drain at scale (r8 ADVICE).
    Compacting with zero epochs can never shrink the count below the
    threshold, so the gate loses nothing."""
    for sub in substores:
        store = os.path.join(root, sub)
        epochs = store_epoch_count(store)
        if epochs >= max_epochs:
            return True
        if (
            max_files is not None
            and epochs > 0
            and store_file_count(store) >= max_files
        ):
            return True
    return False


def run_ingest_cycles(
    spark: SparkSession,
    root: str,
    start_stream: Callable[[], object],
    compact_fn: Callable[[SparkSession, str], dict],
    substores: Sequence[str],
    cycles: int,
    max_epochs: int = 32,
    max_files: int | None = None,
    await_timeout_sec: int = 600,
) -> list[dict]:
    """The run-forever ingest loop with compaction as a scheduled janitor,
    mirroring how the reference schedules its message-partition GC as a
    periodic job outside the write path
    (/root/reference/lib/realtime/messages.ex:72-102): each cycle runs ONE
    availableNow drain of the ingest stream (``start_stream`` re-opens the
    source and returns the started StreamingQuery — an availableNow query
    terminates, and the checkpoint carries the offsets), then, with the
    stream provably stopped (the compaction contract), fires
    ``compact_fn`` when the threshold trips. Returns per-cycle telemetry:
    [{cycle, compacted, epochs_before, files_before, files_after}]."""
    out: list[dict] = []
    for cycle in range(cycles):
        q = start_stream()
        # the compaction contract requires the stream STOPPED: a timed-out
        # drain must abort the cycle, not compact under a live writer
        # (a concurrently-written epoch would be half-captured by the fold)
        if not q.awaitTermination(await_timeout_sec):
            q.stop()
            raise TimeoutError(
                f"ingest cycle {cycle} did not drain within "
                f"{await_timeout_sec}s — compaction skipped (stream-stopped "
                "contract)"
            )
        epochs = max((store_epoch_count(os.path.join(root, s)) for s in substores), default=0)
        files = sum(store_file_count(os.path.join(root, s)) for s in substores)
        fire = should_compact(root, substores, max_epochs, max_files)
        if fire:
            compact_fn(spark, root)
        out.append(
            {
                "cycle": cycle,
                "compacted": fire,
                "epochs_before": epochs,
                "files_before": files,
                "files_after": sum(
                    store_file_count(os.path.join(root, s)) for s in substores
                ),
            }
        )
    return out
