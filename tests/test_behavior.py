"""Unit/property tests for the behavior-analytics batch: staged gate
equivalence, Markov mass accounting, histogram-quantile error bounds, and
the real WAV codec roundtrip."""

import io
import wave

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_lang_quality_cols_matches_column_exprs(spark, sf_dir):
    """The staged projection must be bit-identical to the reference Column
    expressions (detect_lang/quality_score) — it exists only for plan shape."""
    from realtime_spark.operators.text import (
        detect_lang,
        lang_quality_cols,
        quality_score,
    )
    from realtime_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = d.select(
        "doc_id",
        quality_score(F.col("text")).alias("q"),
        detect_lang(F.col("text")).alias("lg"),
    )
    new = lang_quality_cols(d, "text", lang_out="lg", q_out="q").select(
        "doc_id", "q", "lg"
    )
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))


def test_markov_stationary_mass_bounded(spark, sf_dir):
    """Power iteration with floor division only ever loses mass (never
    creates it), and every observed state stays in the frame."""
    from realtime_spark.operators.markov import (
        MICRO,
        stationary_distribution,
        transitions,
    )
    from realtime_spark.sources.testdata import load_table

    e = load_table(spark, sf_dir, "events")
    tr = transitions(e)
    n_states = (
        tr.select(F.col("from_type").alias("s"))
        .unionByName(tr.select(F.col("to_type").alias("s")))
        .distinct()
        .count()
    )
    st = stationary_distribution(tr, iterations=4)
    rows = st.collect()
    assert len(rows) == n_states
    total = sum(r["mass_micro"] for r in rows)
    assert total <= n_states * MICRO
    # floor losses are at most (#states × #iterations × max-fanout) units;
    # with 5 states the retained mass must stay within 1% of the start
    assert total >= n_states * MICRO * 0.99


def test_histogram_quantile_within_bin_width(spark, sf_dir):
    """The histogram estimate must land within one bin width of the exact
    percentile (the approximation's designed error bound)."""
    from realtime_spark.operators.stats import histogram_quantiles
    from realtime_spark.sources.testdata import load_table

    e = load_table(spark, sf_dir, "events")
    est = {
        r["q"]: r["est"]
        for r in histogram_quantiles(
            e, "value", 0.0, 500.0, 50, (0.5, 0.9)
        ).collect()
    }
    exact = e.agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
    ).collect()[0]
    width = 500.0 / 50
    assert abs(est[0.5] - exact["p50"]) <= width
    assert abs(est[0.9] - exact["p90"]) <= width


def test_wav_roundtrip_real_codec():
    """synth_wav output must be a genuine RIFF/WAVE container the stdlib
    decoder accepts, with the documented synthesis formula recoverable."""
    from realtime_spark.operators.multimodal import WAV_RATE, _synth_pcm

    payload = _synth_pcm(42)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    with wave.open(io.BytesIO(payload), "rb") as w:
        assert w.getframerate() == WAV_RATE
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 1
        n = w.getnframes()
        frames = w.readframes(n)
    assert n == 800 + 42 % 100
    assert list(frames[:5]) == [(42 * 7 + i * 13) % 256 for i in range(5)]


def test_wav_stats_distributed_matches_local(spark):
    """The mapInPandas decode path agrees with a driver-side decode."""
    from realtime_spark.operators.multimodal import (
        _synth_pcm,
        synth_wav,
        wav_pcm_stats,
    )

    ids = spark.range(0, 20).select(F.col("id").alias("media_id"))
    out = {r["media_id"]: r for r in wav_pcm_stats(synth_wav(ids)).collect()}
    for mid in range(20):
        raw = _synth_pcm(mid)
        with wave.open(io.BytesIO(raw), "rb") as w:
            frames = w.readframes(w.getnframes())
        samples = list(frames)
        r = out[mid]
        assert r["n_samples"] == len(samples)
        assert r["sum_amp"] == sum(samples)
        assert r["sum_sq_dev"] == sum((s - 128) ** 2 for s in samples)


def test_phrase_hits_counts_adjacent_occurrences(spark):
    from realtime_spark.operators.search import phrase_hits, positional_postings

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta"),
            (2, "beta alpha nothing here"),
            (3, "alpha beta alpha beta alpha beta"),
        ],
        "doc_id bigint, text string",
    )
    post = positional_postings(df, "doc_id", "text")
    hits = {r["doc"]: r["n_hits"] for r in phrase_hits(post, ("alpha", "beta")).collect()}
    assert hits == {1: 2, 3: 3}


def test_pgm_roundtrip_and_malformed():
    from realtime_spark.operators.multimodal import _synth_pgm, decode_pgm

    d = decode_pgm(_synth_pgm(9))
    assert (d["width"], d["height"], d["maxval"]) == (8 + 9 % 5, 6 + 9 % 4, 255)
    # comment/whitespace-tolerant header
    ok = decode_pgm(b"P5\n# c\n 4  2\n255\n" + bytes(range(8)))
    assert ok["sum_px"] == sum(range(8))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_pgm(b"P6\n1 1\n255\n\x00")  # PPM magic
    with _pytest.raises(ValueError):
        decode_pgm(_synth_pgm(3)[:-2])  # truncated raster


def test_triangle_stats_toy_graph(spark):
    from realtime_spark.operators.graph import triangle_stats

    # K3 (1,2,3) + a pendant edge (3,4): nodes 1,2 have 1 triangle, cc=1;
    # node 3 has degree 3, 1 triangle, cc = 2/(3*2) = 0.333333
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "doc_a bigint, doc_b bigint"
    )
    out = {r["node"]: r for r in triangle_stats(edges).collect()}
    assert out[1]["triangles"] == 1 and out[1]["clustering"] == 1.0
    assert out[2]["triangles"] == 1 and out[2]["clustering"] == 1.0
    assert out[3]["triangles"] == 1 and out[3]["clustering"] == 0.333333
    assert out[4]["triangles"] == 0 and out[4]["clustering"] == 0.0


def test_streaming_cusum_monitor_equals_batch(spark, sf_dir, tmp_path):
    """Fold the event stream into the hourly count store micro-batch by
    micro-batch, evaluate CUSUM on the accumulated store, and require
    bit-equality with the batch detector over the full event log."""
    from realtime_spark.operators.stats import cusum_hours
    from realtime_spark.sources.testdata import load_table
    from realtime_spark.streaming.monitors import (
        cusum_from_counts,
        read_counts,
        run_hourly_count_stream,
    )

    e = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    e.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(e.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = run_hourly_count_stream(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        keys=["event_type"],
    )
    q.awaitTermination(300)

    counts = read_counts(spark, str(tmp_path / "store"))
    streamed = cusum_from_counts(counts, ["event_type"])
    batch = cusum_hours(e, ["event_type"])
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
