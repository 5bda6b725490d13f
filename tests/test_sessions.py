"""Sessionization: batch gap-sessions vs the native streaming session_window
lift — streaming must emit exactly the batch sessions minus each key's final
session (append mode finalizes a session only once the watermark passes it).
"""

from __future__ import annotations

import os
import tempfile

from realtime_spark.operators.sessions import session_stats, streaming_sessions
from realtime_spark.sources.testdata import load_table
from tests.conftest import SF_DIR

_GAP = 86400


def _key(r):
    return (r["user_id"], str(r["session_start"]), r["n_events"])


def test_streaming_sessions_match_batch_up_to_watermark(spark):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts")
    batch = {_key(r) for r in session_stats(ev, ["user_id"], gap_seconds=_GAP).collect()}
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        ev.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        out = streaming_sessions(
            stream, ["user_id"], gap_seconds=_GAP, watermark="0 seconds"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("sessions_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {_key(r) for r in spark.sql("SELECT * FROM sessions_test").collect()}

    assert got <= batch, f"streaming emitted sessions batch never saw: {got - batch}"
    # everything missing must be a key's LAST session (not yet finalized)
    last_per_user: dict = {}
    for u, s, _n in batch:
        last_per_user[u] = max(last_per_user.get(u, ""), s)
    for u, s, _n in batch - got:
        assert s == last_per_user[u], (
            f"non-final session missing from stream: user={u} start={s}"
        )
    assert len(got) > 0
