"""Dispatch-layer plans: batch-broadcast outcome classification, channel
fastlane fan-out accounting, and CDC subscriber-id fanout.

Fixtures are deterministic derivations of `events` / `orders` / `nation` /
`range()` so the DuckDB oracle can rebuild them verbatim; all join keys,
tri-state booleans, and id arrays are constructed with the same modular
arithmetic on both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.operators.dispatch import (
    batch_broadcast_outcomes,
    cdc_fanout,
    cdc_fanout_summary,
    fastlane_pairs,
    fastlane_summary,
    presence_counter,
    single_broadcast_outcomes,
)
from realtime_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# batch broadcast (lib/realtime/tenants/batch_broadcast.ex)
# ---------------------------------------------------------------------------

# tenant fixture knobs (tenant key = n_nationkey % 25, 25 tenants):
#   n21 suspended; n3/n17 carry an oversized payload (poisoned batch);
#   n5 already over its rate limit; n7 fails the batch-size precheck;
#   tenants with key % 4 == 0 call as super_user.
_SUSPENDED = 21
_INVALID = (3, 17)
_RATE_LIMITED = 5
_BATCH_LARGE = 7

_BB_POLICIES = [
    {"topic": "click", "claims_role": "authenticated", "can_write": True},
    {"topic": "view", "claims_role": "authenticated", "can_write": False},
    {"topic": "purchase", "claims_role": "service_role", "can_write": True},
    {"topic": "signup", "claims_role": "anon", "can_write": True},
]


def _bb_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    tkey = F.col("user_id") % 25
    rep = (
        F.when(
            tkey.isin(*_INVALID) & (F.col("event_id") % 13 == 0), F.lit(200)
        )
        .otherwise(F.col("user_id") % 3 + 1)
        .cast("int")
    )
    role = (
        F.when(F.col("user_id") % 3 == 0, F.lit("anon"))
        .when(F.col("user_id") % 3 == 1, F.lit("authenticated"))
        .otherwise(F.lit("service_role"))
    )
    return e.select(
        F.concat(F.lit("n"), tkey).alias("tenant_id"),
        F.col("event_id").cast("string").alias("id"),
        F.col("event_type").alias("topic"),
        F.lit("broadcast").alias("event"),
        F.repeat(F.substring("props", 1, 8), rep).alias("payload_json"),
        (F.col("event_id") % 2 == 0).alias("private"),
        role.alias("claims_role"),
        (tkey % 4 == 0).alias("super_user"),
    )


def _bb_tenants(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return n.select(
        F.concat(F.lit("n"), k).alias("tenant_id"),
        (k == _SUSPENDED).alias("suspended"),
        F.when(k == _RATE_LIMITED, 100)
        .when(k == _BATCH_LARGE, 500)
        .otherwise(1000000000)
        .cast("long")
        .alias("max_eps"),
        F.when(k == _RATE_LIMITED, 1000)
        .when(k == _BATCH_LARGE, 499)
        .otherwise(10)
        .cast("long")
        .alias("current_eps"),
        F.lit(1).alias("max_payload_kb"),
    )


def _bb_policies(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _BB_POLICIES, schema="topic string, claims_role string, can_write boolean"
    )


def q_batch_broadcast_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = _bb_messages(spark, sf_dir)
    tenants = _bb_tenants(spark, sf_dir)
    return batch_broadcast_outcomes(msgs, tenants, _bb_policies(spark))


_BB_MSG_CTE = """
_bbm AS (
  SELECT 'n' || (user_id % 25) AS tenant_id,
         CAST(event_id AS VARCHAR) AS id,
         event_type AS topic,
         (event_id % 2 = 0) AS private,
         CASE WHEN user_id % 3 = 0 THEN 'anon'
              WHEN user_id % 3 = 1 THEN 'authenticated'
              ELSE 'service_role' END AS claims_role,
         ((user_id % 25) % 4 = 0) AS super_user,
         strlen(repeat(substr(props, 1, 8),
                CASE WHEN (user_id % 25) IN (3, 17) AND event_id % 13 = 0
                     THEN 200 ELSE CAST(user_id % 3 + 1 AS INT) END)) AS plen
  FROM events
),
_bbt AS (
  SELECT 'n' || n_nationkey AS tenant_id,
         (n_nationkey = 21) AS suspended,
         CASE n_nationkey WHEN 5 THEN 100 WHEN 7 THEN 500
              ELSE 1000000000 END AS max_eps,
         CASE n_nationkey WHEN 5 THEN 1000 WHEN 7 THEN 499
              ELSE 10 END AS current_eps
  FROM nation
),
_bbp (p_topic, p_role, p_write) AS (
  VALUES ('click', 'authenticated', TRUE), ('view', 'authenticated', FALSE),
         ('purchase', 'service_role', TRUE), ('signup', 'anon', TRUE)
),
_bbb AS (
  SELECT tenant_id, COUNT(*) AS batch_n,
         MAX(CASE WHEN plen > 1000 THEN 1 ELSE 0 END) AS any_invalid
  FROM _bbm GROUP BY tenant_id
)
"""

ORACLE_BATCH_BROADCAST_OUTCOMES = f"""
WITH {_BB_MSG_CTE.strip()}
SELECT m.tenant_id, m.id, m.topic, m.private,
  CASE WHEN t.suspended THEN 'tenant_suspended'
       WHEN b.any_invalid = 1 THEN 'invalid_batch'
       WHEN t.current_eps > t.max_eps THEN 'rate_limited'
       WHEN b.batch_n + t.current_eps > t.max_eps THEN 'batch_too_large'
       WHEN NOT m.private THEN 'sent_public'
       WHEN m.super_user THEN 'sent_super_user'
       WHEN COALESCE(p.p_write, FALSE) THEN 'sent_private'
       ELSE 'unauthorized' END AS outcome,
  CASE WHEN t.suspended THEN FALSE
       WHEN b.any_invalid = 1 THEN FALSE
       WHEN t.current_eps > t.max_eps THEN FALSE
       WHEN b.batch_n + t.current_eps > t.max_eps THEN FALSE
       WHEN NOT m.private THEN TRUE
       WHEN m.super_user THEN TRUE
       ELSE COALESCE(p.p_write, FALSE) END AS sent
FROM _bbm m
JOIN _bbt t USING (tenant_id)
JOIN _bbb b USING (tenant_id)
LEFT JOIN _bbp p ON m.topic = p.p_topic AND m.claims_role = p.p_role
"""


# ---------------------------------------------------------------------------
# single broadcast (lib/realtime/tenants/single_broadcast.ex)
# ---------------------------------------------------------------------------

# per-message path: payload straddles the binary +500-byte allowance
# (8 chars x 187 = 1496 bytes: invalid as json at the 1 KB limit, valid as
# binary at 1000+500); every 17th payload is absent entirely.
_SB_OVERSIZE_REPS = 187


def _sb_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    tkey = F.col("user_id") % 25
    rep = (
        F.when(F.col("event_id") % 13 == 0, F.lit(_SB_OVERSIZE_REPS))
        .otherwise(F.col("user_id") % 3 + 1)
        .cast("int")
    )
    payload = F.when(
        F.col("event_id") % 17 != 0, F.repeat(F.substring("props", 1, 8), rep)
    )
    role = (
        F.when(F.col("user_id") % 3 == 0, F.lit("anon"))
        .when(F.col("user_id") % 3 == 1, F.lit("authenticated"))
        .otherwise(F.lit("service_role"))
    )
    return e.select(
        F.concat(F.lit("n"), tkey).alias("tenant_id"),
        F.col("event_id").cast("string").alias("id"),
        F.col("event_type").alias("topic"),
        F.lit("msg").alias("event"),
        payload.alias("payload"),
        F.when(F.col("user_id") % 2 == 0, F.lit("json"))
        .otherwise(F.lit("binary"))
        .alias("content_type"),
        (F.col("event_id") % 2 == 0).alias("private"),
        role.alias("claims_role"),
    )


def q_single_broadcast_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return single_broadcast_outcomes(
        _sb_messages(spark, sf_dir), _bb_tenants(spark, sf_dir), _bb_policies(spark)
    )


ORACLE_SINGLE_BROADCAST_OUTCOMES = f"""
WITH _sbm AS (
  SELECT 'n' || (user_id % 25) AS tenant_id,
         CAST(event_id AS VARCHAR) AS id,
         event_type AS topic,
         (event_id % 2 = 0) AS private,
         CASE WHEN user_id % 3 = 0 THEN 'anon'
              WHEN user_id % 3 = 1 THEN 'authenticated'
              ELSE 'service_role' END AS claims_role,
         CASE WHEN user_id % 2 = 0 THEN 'json' ELSE 'binary' END
           AS content_type,
         CASE WHEN event_id % 17 <> 0 THEN
           strlen(repeat(substr(props, 1, 8),
                  CASE WHEN event_id % 13 = 0 THEN {_SB_OVERSIZE_REPS}
                       ELSE CAST(user_id % 3 + 1 AS INT) END)) END AS plen
  FROM events
),
_sbt AS (
  SELECT 'n' || n_nationkey AS tenant_id,
         (n_nationkey = 21) AS suspended,
         CASE n_nationkey WHEN 5 THEN 100 WHEN 7 THEN 500
              ELSE 1000000000 END AS max_eps,
         CASE n_nationkey WHEN 5 THEN 1000 WHEN 7 THEN 499
              ELSE 10 END AS current_eps
  FROM nation
),
_sbp (p_topic, p_role, p_write) AS (
  VALUES ('click', 'authenticated', TRUE), ('view', 'authenticated', FALSE),
         ('purchase', 'service_role', TRUE), ('signup', 'anon', TRUE)
),
_sbo AS (
  SELECT m.tenant_id, m.id, m.topic, m.private,
    CASE WHEN t.suspended THEN 'forbidden_suspended'
         WHEN m.plen IS NULL
              OR m.plen > 1000 + CASE WHEN m.content_type = 'binary'
                                      THEN 500 ELSE 0 END THEN 'invalid'
         WHEN t.current_eps >= t.max_eps THEN 'rate_limited'
         WHEN NOT m.private THEN 'ok_public'
         WHEN COALESCE(p.p_write, FALSE) THEN 'ok_private'
         ELSE 'forbidden_unauthorized' END AS outcome,
    m.content_type
  FROM _sbm m
  JOIN _sbt t USING (tenant_id)
  LEFT JOIN _sbp p ON m.topic = p.p_topic AND m.claims_role = p.p_role
)
SELECT tenant_id, id, topic, private, outcome,
  CASE outcome WHEN 'forbidden_suspended' THEN 403
       WHEN 'invalid' THEN 422 WHEN 'rate_limited' THEN 429
       WHEN 'forbidden_unauthorized' THEN 403 ELSE 202 END AS status,
  CASE WHEN outcome LIKE 'ok%' THEN content_type END AS payload_encoding
FROM _sbo
"""


# ---------------------------------------------------------------------------
# channel fastlane dispatcher (realtime_channel/message_dispatcher.ex)
# ---------------------------------------------------------------------------

_N_SOCKETS = 40
_REPLAY_SPAN = 12  # each socket has replayed ids [i*12, i*12+12)


def _fl_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    event = (
        F.when(k % 5 == 0, F.lit("presence_diff"))
        .when(k % 5 == 1, F.lit("system"))
        .otherwise(F.lit("broadcast"))
    )
    # UserBroadcasts exist only on the generic dispatch clause — a
    # presence_diff or system push can never be one (UserBroadcast structs
    # carry user_event, not a channel event), so the flag is confined to
    # the 'broadcast' rows
    is_ub = (k % 7 == 3) & (k % 5 >= 2)
    return o.select(
        k.alias("msg_id"),
        F.concat(F.lit("n"), k % 2).alias("tenant_id"),
        F.concat(F.lit("room"), k % 8).alias("topic"),
        event.alias("event"),
        is_ub.alias("is_user_broadcast"),
        F.when(
            is_ub,
            F.when(k % 2 == 0, F.lit("json")).otherwise(F.lit("binary")),
        ).alias("payload_encoding"),
        F.when(k % 3 == 0, (k % 480).cast("string")).alias("message_uid"),
        F.concat(F.lit("s"), k % _N_SOCKETS).alias("sender_socket"),
    )


def _fl_subscribers(spark: SparkSession) -> DataFrame:
    i = F.col("id")
    pres = (
        F.when(i % 3 == 0, F.lit(True))
        .when(i % 3 == 1, F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
    bcast = (
        F.when(i % 4 == 1, F.lit(False))
        .when(i % 4 == 2, F.lit(None).cast("boolean"))
        .otherwise(F.lit(True))
    )
    replayed = F.transform(
        F.sequence(i * _REPLAY_SPAN, i * _REPLAY_SPAN + _REPLAY_SPAN - 1),
        lambda x: x.cast("string"),
    )
    return spark.range(_N_SOCKETS).select(
        F.concat(F.lit("s"), i).alias("socket_id"),
        F.concat(F.lit("n"), i % 2).alias("tenant_id"),
        F.concat(F.lit("room"), i % 8).alias("join_topic"),
        F.when(i % 2 == 0, F.lit("v1")).otherwise(F.lit("v2")).alias("serializer"),
        pres.alias("presence_read"),
        bcast.alias("broadcast_read"),
        replayed.alias("replayed_ids"),
    )


def _fl_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fastlane_pairs(_fl_messages(spark, sf_dir), _fl_subscribers(spark))


def q_fastlane_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fastlane_summary(_fl_pairs(spark, sf_dir))


def q_fastlane_presence_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return presence_counter(_fl_pairs(spark, sf_dir))


_FL_CTE = f"""
_flm AS (
  SELECT o_orderkey AS msg_id,
         'n' || (o_orderkey % 2) AS tenant_id,
         'room' || (o_orderkey % 8) AS topic,
         CASE WHEN o_orderkey % 5 = 0 THEN 'presence_diff'
              WHEN o_orderkey % 5 = 1 THEN 'system'
              ELSE 'broadcast' END AS event,
         (o_orderkey % 7 = 3 AND o_orderkey % 5 >= 2) AS is_user_broadcast,
         CASE WHEN o_orderkey % 7 = 3 AND o_orderkey % 5 >= 2 THEN
           CASE WHEN o_orderkey % 2 = 0 THEN 'json' ELSE 'binary' END
         END AS payload_encoding,
         CASE WHEN o_orderkey % 3 = 0
              THEN CAST(o_orderkey % 480 AS VARCHAR) END AS message_uid,
         's' || (o_orderkey % {_N_SOCKETS}) AS sender_socket
  FROM orders
),
_fls AS (
  SELECT 's' || i AS socket_id,
         'n' || (i % 2) AS s_tid,
         'room' || (i % 8) AS join_topic,
         CASE WHEN i % 2 = 0 THEN 'v1' ELSE 'v2' END AS serializer,
         CASE WHEN i % 3 = 0 THEN TRUE WHEN i % 3 = 1 THEN FALSE END
           AS presence_read,
         CASE WHEN i % 4 = 1 THEN FALSE WHEN i % 4 = 2 THEN NULL
              ELSE TRUE END AS broadcast_read,
         i * {_REPLAY_SPAN} AS rlo, (i + 1) * {_REPLAY_SPAN} AS rhi
  FROM range(0, {_N_SOCKETS}) t(i)
),
_flp AS (
  SELECT m.msg_id, m.tenant_id, m.event, s.socket_id, s.serializer,
    CASE WHEN m.event = 'presence_diff' THEN
           CASE WHEN s.presence_read = FALSE THEN 'withheld'
                WHEN s.presence_read IS NULL THEN 'deferred'
                ELSE 'delivered' END
         WHEN (m.is_user_broadcast OR m.event = 'broadcast')
              AND s.broadcast_read IS DISTINCT FROM TRUE THEN 'withheld'
         WHEN m.message_uid IS NOT NULL
              AND CAST(m.message_uid AS BIGINT) >= s.rlo
              AND CAST(m.message_uid AS BIGINT) < s.rhi THEN 'replayed'
         WHEN m.is_user_broadcast AND m.payload_encoding = 'binary'
              AND s.serializer = 'v1' THEN 'encode_failed'
         ELSE 'delivered' END AS outcome
  FROM _flm m
  JOIN _fls s ON m.tenant_id = s.s_tid AND m.topic = s.join_topic
  WHERE s.socket_id <> m.sender_socket
)
"""

ORACLE_FASTLANE_DISPATCH = f"""
WITH {_FL_CTE.strip()}
SELECT msg_id, tenant_id, event,
       COUNT(*) FILTER (outcome = 'delivered') AS n_delivered,
       COUNT(*) FILTER (outcome = 'withheld') AS n_withheld,
       COUNT(*) FILTER (outcome = 'deferred') AS n_deferred,
       COUNT(*) FILTER (outcome = 'replayed') AS n_replayed,
       COUNT(*) FILTER (outcome = 'encode_failed') AS n_encode_failed,
       COUNT(DISTINCT serializer) FILTER (outcome IN ('delivered', 'encode_failed'))
         AS n_encodes
FROM _flp
GROUP BY msg_id, tenant_id, event
"""

ORACLE_FASTLANE_PRESENCE_COUNTER = f"""
WITH {_FL_CTE.strip()}
SELECT tenant_id, COUNT(*) AS presence_events
FROM _flp
WHERE event = 'presence_diff' AND outcome = 'delivered'
GROUP BY tenant_id
"""


# ---------------------------------------------------------------------------
# CDC subscriber fanout (postgres_cdc_rls/message_dispatcher.ex)
# ---------------------------------------------------------------------------

_N_CDC_SOCKETS = 30


def _cdc_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    c = F.col("o_custkey")
    ctype = (
        F.when(k % 3 == 0, F.lit("INSERT"))
        .when(k % 3 == 1, F.lit("UPDATE"))
        .otherwise(F.lit("DELETE"))
    )
    sub_ids = F.array_distinct(
        F.array(
            (c % 60).cast("string"),
            (k % 60).cast("string"),
            ((c + k) % 60).cast("string"),
        )
    )
    return o.select(
        k.alias("msg_id"),
        F.concat(F.lit("t"), k % 4).alias("topic"),
        ctype.alias("change_type"),
        sub_ids.alias("sub_ids"),
    )


def _cdc_subscribers(spark: SparkSession) -> DataFrame:
    i = F.col("id")
    ids = F.array_distinct(
        F.array(i.cast("string"), (i + 30).cast("string"), ((i * 7) % 60).cast("string"))
    )
    return spark.range(_N_CDC_SOCKETS).select(
        F.concat(F.lit("s"), i).alias("socket_id"),
        F.concat(F.lit("t"), i % 4).alias("join_topic"),
        F.when(i % 2 == 0, F.lit("v1")).otherwise(F.lit("v2")).alias("serializer"),
        (i % 3 > 0).alias("is_new_api"),
        ids.alias("ids"),
    )


def q_cdc_fanout_deliveries(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc_fanout(_cdc_changes(spark, sf_dir), _cdc_subscribers(spark))


def q_cdc_fanout_encodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc_fanout_summary(
        cdc_fanout(_cdc_changes(spark, sf_dir), _cdc_subscribers(spark))
    )


_CDC_CTE = f"""
_cdm AS (
  SELECT o_orderkey AS msg_id,
         't' || (o_orderkey % 4) AS topic,
         CASE WHEN o_orderkey % 3 = 0 THEN 'INSERT'
              WHEN o_orderkey % 3 = 1 THEN 'UPDATE'
              ELSE 'DELETE' END AS change_type,
         list_distinct([CAST(o_custkey % 60 AS VARCHAR),
                        CAST(o_orderkey % 60 AS VARCHAR),
                        CAST((o_custkey + o_orderkey) % 60 AS VARCHAR)])
           AS sub_ids
  FROM orders
),
_cds AS (
  SELECT 's' || i AS socket_id,
         't' || (i % 4) AS join_topic,
         CASE WHEN i % 2 = 0 THEN 'v1' ELSE 'v2' END AS serializer,
         (i % 3 > 0) AS is_new_api,
         list_distinct([CAST(i AS VARCHAR), CAST(i + 30 AS VARCHAR),
                        CAST((i * 7) % 60 AS VARCHAR)]) AS ids
  FROM range(0, {_N_CDC_SOCKETS}) t(i)
),
_cdd AS (
  SELECT m.msg_id, m.topic, s.socket_id, s.serializer,
         CASE WHEN s.is_new_api THEN 'postgres_changes'
              ELSE m.change_type END AS event,
         array_to_string(list_sort(list_intersect(s.ids, m.sub_ids)), ',')
           AS valid_ids
  FROM _cdm m
  JOIN _cds s ON m.topic = s.join_topic
  WHERE len(list_intersect(s.ids, m.sub_ids)) > 0
)
"""

ORACLE_CDC_FANOUT_DELIVERIES = f"""
WITH {_CDC_CTE.strip()}
SELECT msg_id, topic, socket_id, serializer, event, valid_ids FROM _cdd
"""

ORACLE_CDC_FANOUT_ENCODES = f"""
WITH {_CDC_CTE.strip()}
SELECT msg_id, topic, COUNT(*) AS n_delivered,
       COUNT(DISTINCT serializer || '|' || event || '|' || valid_ids)
         AS n_encodes
FROM _cdd
GROUP BY msg_id, topic
"""


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def dispatch_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "batch_broadcast_outcomes": q_batch_broadcast_outcomes,
        "single_broadcast_outcomes": q_single_broadcast_outcomes,
        "fastlane_dispatch": q_fastlane_dispatch,
        "fastlane_presence_counter": q_fastlane_presence_counter,
        "cdc_fanout_deliveries": q_cdc_fanout_deliveries,
        "cdc_fanout_encodes": q_cdc_fanout_encodes,
        "v2_push_decode": q_v2_push_decode,
    }


def dispatch_oracles() -> dict[str, str]:
    return {
        "batch_broadcast_outcomes": ORACLE_BATCH_BROADCAST_OUTCOMES,
        "single_broadcast_outcomes": ORACLE_SINGLE_BROADCAST_OUTCOMES,
        "fastlane_dispatch": ORACLE_FASTLANE_DISPATCH,
        "fastlane_presence_counter": ORACLE_FASTLANE_PRESENCE_COUNTER,
        "cdc_fanout_deliveries": ORACLE_CDC_FANOUT_DELIVERIES,
        "cdc_fanout_encodes": ORACLE_CDC_FANOUT_ENCODES,
        "v2_push_decode": ORACLE_V2_PUSH_DECODE,
    }


# ---------------------------------------------------------------------------
# inbound V2 binary decode (v2_serializer.ex:158-212): encode->decode
# roundtrip in Spark, expectations stated directly by the oracle
# ---------------------------------------------------------------------------


def _v2_push_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime_spark.operators.routing import _int1

    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    enc8 = lambda c: F.encode(c, "UTF-8")  # noqa: E731
    jr = enc8(F.concat(F.lit("j"), k % 5))
    ref = enc8((k % 100).cast("string"))
    topic = enc8(F.concat(F.lit("room:"), k % 8))
    payload = enc8(F.substring("o_orderpriority", 1, 5))
    ev = enc8(F.concat(F.lit("e"), k % 7))
    f0 = F.concat(
        _int1(F.lit(0)),
        _int1(F.octet_length(jr)),
        _int1(F.octet_length(ref)),
        _int1(F.octet_length(topic)),
        _int1(F.octet_length(ev)),
        jr, ref, topic, ev, payload,
    )
    ue = enc8(F.concat(F.lit("ue"), k % 4))
    meta = enc8(
        F.when(
            k % 4 == 0,
            F.concat(F.lit('{"id":'), (k % 50).cast("string"), F.lit("}")),
        ).otherwise(F.lit(""))
    )
    f3 = F.concat(
        _int1(F.lit(3)),
        _int1(F.octet_length(jr)),
        _int1(F.octet_length(ref)),
        _int1(F.octet_length(topic)),
        _int1(F.octet_length(ue)),
        _int1(F.octet_length(meta)),
        _int1((k % 2).cast("int")),
        jr, ref, topic, ue, meta, payload,
    )
    return o.select(
        F.when(k % 3 == 0, f0).otherwise(f3).alias("frame")
    )


def q_v2_push_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: frames byte-built by the V2 layout, then decoded by the
    byte-slicing decoder; the oracle states the expected fields directly
    from the base columns, so drift in EITHER direction mismatches."""
    from realtime_spark.operators.routing import v2_decode_push

    return v2_decode_push(_v2_push_frames(spark, sf_dir))


ORACLE_V2_PUSH_DECODE = """
WITH b AS (
  SELECT o_orderkey AS k, substr(o_orderpriority, 1, 5) AS pay FROM orders
)
SELECT
  CASE WHEN k % 3 = 0 THEN 'push' ELSE 'user_broadcast_push' END AS kind,
  'j' || (k % 5) AS join_ref,
  CAST(k % 100 AS VARCHAR) AS ref,
  'room:' || (k % 8) AS topic,
  CASE WHEN k % 3 = 0 THEN 'e' || (k % 7) ELSE 'broadcast' END AS event,
  CASE WHEN k % 3 <> 0 THEN 'ue' || (k % 4) END AS user_event,
  CASE WHEN k % 3 = 0 THEN 'binary'
       WHEN k % 2 = 0 THEN 'binary' ELSE 'json' END AS payload_encoding,
  CASE WHEN k % 3 <> 0 THEN
    CASE WHEN k % 4 = 0 THEN '{"id":' || (k % 50) || '}' ELSE '{}' END
  END AS metadata_json,
  hex(pay) AS payload_hex
FROM b
"""
