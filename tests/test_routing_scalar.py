"""Unit tests: node routing (J6), V2 frames (S9), subscription upsert (S4),
decoder scalar functions (F4/F5/F6)."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestScalars:
    def test_pg_epoch_us(self, spark):
        from realtime_spark.functions.scalar import pg_epoch_us_to_timestamp

        df = spark.range(1).select(
            pg_epoch_us_to_timestamp(F.lit(0).cast("bigint")).alias("ts")
        )
        assert str(df.collect()[0]["ts"]).startswith("2000-01-01 00:00:00")

    def test_lsn_decode_format(self, spark):
        from realtime_spark.functions.scalar import lsn_decode, lsn_format

        lsn = (F.lit(0x16) * F.lit(2**32) + F.lit(0x2D0C758)).cast("bigint")
        row = spark.range(1).select(
            lsn_decode(lsn).alias("d"), lsn_format(lsn).alias("s")
        ).collect()[0]
        assert row["d"]["file"] == 0x16 and row["d"]["offset"] == 0x2D0C758
        assert row["s"] == "16/2D0C758"

    def test_uuid_from_bytes(self, spark):
        from realtime_spark.functions.scalar import uuid_from_bytes

        b = bytes(range(16))
        row = spark.createDataFrame([(b,)], "b binary").select(
            uuid_from_bytes(F.col("b")).alias("u")
        ).collect()[0]
        assert row["u"] == "00010203-0405-0607-0809-0a0b0c0d0e0f"


class TestV2Frame:
    def test_frame_layout(self, spark):
        from realtime_spark.operators.routing import encode_frames

        df = spark.createDataFrame(
            [("m1", "room:1", "broadcast", {"k": "v"}, True)],
            "id string, topic string, event string, payload map<string,string>, private boolean",
        )
        frame = bytes(encode_frames(df).collect()[0]["frame"])
        # v2_serializer.ex:32-41 header: opcode, three 1-byte sizes, then
        # the payload-encoding flag (1 = json)
        assert frame[0] == 4  # opcode
        topic_len, event_len, meta_len = frame[1], frame[2], frame[3]
        assert frame[4] == 1  # user_payload_encoding: json
        off = 5
        assert frame[off : off + topic_len].decode() == "room:1"
        off += topic_len
        assert frame[off : off + event_len].decode() == "broadcast"
        off += event_len
        meta = frame[off : off + meta_len].decode()
        assert '"id":"m1"' in meta and '"private":true' in meta
        off += meta_len
        assert frame[off:].decode() == '{"k":"v"}'

    def test_binary_broadcast_frame_layout(self, spark):
        from pyspark.sql import functions as F

        from realtime_spark.operators.routing import v2_broadcast_binary_frame

        df = spark.createDataFrame([(b"\x01\x02",)], "data binary").select(
            v2_broadcast_binary_frame(
                F.lit("room:1"), F.lit("ev"), F.col("data")
            ).alias("frame")
        )
        frame = bytes(df.collect()[0]["frame"])
        assert frame[0] == 2 and frame[1] == 6 and frame[2] == 2
        assert frame[3:9].decode() == "room:1"
        assert frame[9:11].decode() == "ev"
        assert frame[11:] == b"\x01\x02"


class TestSubscriptionUpsert:
    def test_conflict_replaces(self, spark):
        from realtime_spark.operators.cdc import subscriptions_df, upsert_subscriptions

        a = subscriptions_df(
            spark,
            [
                {"subscription_id": "s1", "table": "orders", "claims_role": "anon"},
                {"subscription_id": "s2", "table": "orders"},
            ],
        )
        b = subscriptions_df(
            spark,
            [  # same key as s1 row but different claims_role -> replaces
                {"subscription_id": "s1", "table": "orders", "claims_role": "service"},
                {"subscription_id": "s3", "table": "nation"},
            ],
        )
        out = upsert_subscriptions(a, b)
        rows = {r["subscription_id"]: r for r in out.collect()}
        assert set(rows) == {"s1", "s2", "s3"}
        assert rows["s1"]["claims_role"] == "service"

    def test_distinct_filters_coexist(self, spark):
        from realtime_spark.operators.cdc import subscriptions_df, upsert_subscriptions

        a = subscriptions_df(
            spark,
            [{"subscription_id": "s1", "table": "orders", "filters": "o_orderstatus=eq.F"}],
        )
        b = subscriptions_df(
            spark,
            [{"subscription_id": "s1", "table": "orders", "filters": "o_orderstatus=eq.O"}],
        )
        assert upsert_subscriptions(a, b).count() == 2  # different key -> both kept


class TestRouting:
    def test_fallback_broadcast_node(self, spark):
        from realtime_spark.operators.routing import node_map_df, route_to_nodes

        matched = spark.createDataFrame(
            [(1, ["sa", "sb"]), (2, ["sb"])],
            "change_id long, subscription_ids array<string>",
        )
        nodes = node_map_df(spark, [{"subscription_id": "sa", "node": "n1"}])
        out = {(r["node"], r["change_id"]): r for r in route_to_nodes(matched, nodes).collect()}
        assert out[("n1", 1)]["subscription_ids"] == ["sa"]
        assert out[("*", 1)]["subscription_ids"] == ["sb"]
        assert out[("*", 2)]["subscription_ids"] == ["sb"]


class TestSubscriptionDelete:
    def test_unsubscribe_removes_only_target_ids(self, spark):
        import __spark_entry__ as em
        from realtime_spark.operators.cdc import delete_subscriptions

        subs = em.subscriptions_df(spark, em._MULTI_SPECS)
        left = delete_subscriptions(subs, ["sub-gt", "sub-null"])
        got = {r["subscription_id"] for r in left.select("subscription_id").collect()}
        assert got == {"sub-eq-f", "sub-ins", "sub-and"}


class TestV1Frame:
    """V1 JSON serializer parity: the {"topic","event","payload","ref"}
    object with proper string escaping, one frame per message (O4)."""

    def test_roundtrips_as_phoenix_v1_object(self, spark):
        import json

        from pyspark.sql import functions as F

        from realtime_spark.operators.routing import v1_message

        rows = [
            ("room:1", "new_msg", '{"a":1}'),
            ('we"ird\\topic', "evént", '{"x":"y"}'),
            ("t", "e", '{"nested":{"k":[1,2]}}'),
        ]
        df = spark.createDataFrame(rows, "topic string, event string, pj string")
        out = df.select(
            "topic", "event", "pj",
            v1_message(F.col("topic"), F.col("event"), F.col("pj")).alias("f"),
        ).collect()
        for r in out:
            assert json.loads(r["f"]) == {
                "topic": r["topic"],
                "event": r["event"],
                "payload": json.loads(r["pj"]),
                "ref": None,
            }

    def test_encode_frames_v1_carries_dedup_id(self, spark):
        import json

        from realtime_spark.operators.routing import encode_frames_v1

        msgs = spark.createDataFrame(
            [(7, "room:1", "broadcast", {"k": "v"}, True)],
            "id bigint, topic string, event string, payload map<string,string>, private boolean",
        )
        row = encode_frames_v1(msgs).collect()[0]
        obj = json.loads(row["frame_v1"])
        assert obj["topic"] == "room:1" and obj["event"] == "broadcast"
        assert obj["ref"] is None
        assert obj["payload"]["id"] == 7 and obj["payload"]["private"] is True
        assert obj["payload"]["payload"] == {"k": "v"}


class TestV2Decode:
    def test_push_and_user_broadcast_push_roundtrip(self, spark):
        from pyspark.sql import functions as F

        from realtime_spark.operators.routing import v2_decode_push

        # hand-built frames: opcode 0, opcode 3 (empty + present metadata),
        # and an unknown opcode that must be dropped
        f0 = bytes([0, 2, 2, 6, 3]) + b"j1r7room:1ev0" + b"\x01\x02"
        f3 = (
            bytes([3, 2, 3, 6, 3, 0, 1])
            + b"j2" + b"r42" + b"room:2" + b"ue1" + b"PAY"
        )
        f3m = (
            bytes([3, 2, 3, 6, 3, 10, 0])
            + b"j3" + b"r43" + b"room:3" + b"ue2" + b'{"id":"x"}' + b"\xff"
        )
        bad = bytes([9, 1, 1, 1]) + b"xyz"
        df = spark.createDataFrame([(f0,), (f3,), (f3m,), (bad,)], "frame binary")
        rows = {r["topic"]: r for r in v2_decode_push(df).collect()}
        assert set(rows) == {"room:1", "room:2", "room:3"}

        r = rows["room:1"]
        assert r["kind"] == "push" and r["join_ref"] == "j1"
        # the inbound push DOES carry ref (v2_serializer.ex:158-177),
        # unlike the outbound encode! push layout
        assert r["event"] == "ev0" and r["ref"] == "r7"
        assert r["payload_encoding"] == "binary" and r["payload_hex"] == "0102"

        r = rows["room:2"]
        assert r["kind"] == "user_broadcast_push" and r["ref"] == "r42"
        assert r["event"] == "broadcast" and r["user_event"] == "ue1"
        assert r["payload_encoding"] == "json"  # flag byte 1
        assert r["metadata_json"] == "{}"  # empty metadata decodes to {}
        assert r["payload_hex"] == b"PAY".hex().upper()

        r = rows["room:3"]
        assert r["payload_encoding"] == "binary"  # flag byte 0
        assert r["metadata_json"] == '{"id":"x"}'
        assert r["payload_hex"] == "FF"
