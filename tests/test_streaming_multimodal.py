"""Streaming tier parity tests (stream == batch when drained) and
multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_cookbook_spark.sources.multimodal import (
    extract_features,
    fake_media_frame,
    frame_sample_plan,
)
from bigdata_cookbook_spark.sources.testdata import load_table
from bigdata_cookbook_spark.streaming.events import (
    stream_events,
    streaming_dedup,
    windowed_counts,
)


def _drain(stream_df, name: str, spark, mode: str | None = None):
    if mode is None:
        mode = "append" if name in ("dedup_sink", "prof_sink") else "complete"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_windowed_counts_match_batch(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    out = _drain(windowed_counts(stream, "1 day"), "win_sink", spark)
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    got = {(str(r.day), r.event_type): r.cnt for r in out.collect()}
    want = {(str(r.day), r.event_type): r.cnt for r in batch.collect()}
    assert got == want


def test_streaming_dedup(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    out = _drain(streaming_dedup(stream), "dedup_sink", spark)
    n_batch = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert out.count() == n_batch


def test_media_features_deterministic(spark):
    media = fake_media_frame(spark, n=48)
    f1 = extract_features(media).orderBy("media_id").collect()
    f2 = extract_features(media).orderBy("media_id").collect()
    assert f1 == f2
    assert len(f1) == 48
    assert all(r.feature_ok and r.n_bytes == 256 for r in f1)


def test_media_partitioning_preserved(spark):
    media = fake_media_frame(spark, n=48).repartition(6)
    feats = extract_features(media)
    assert feats.rdd.getNumPartitions() == 6
    assert feats.count() == 48


def test_real_decoder_decodes_wav(spark):
    """decoder='real' actually decodes: WAV payloads via stdlib wave —
    feature stats must match a local decode of the same bytes."""
    import hashlib
    import io
    import wave

    from bigdata_cookbook_spark.sources.multimodal import wav_media_frame

    media = wav_media_frame(spark, n=12)
    got = {r.media_id: r for r in extract_features(media, decoder="real").collect()}
    for row in media.collect():
        with wave.open(io.BytesIO(bytes(row.payload)), "rb") as w:
            raw = w.readframes(w.getnframes())
        g = got[row.media_id]
        assert g.feature_ok and g.n_bytes == len(raw)
        assert g.byte_sha256 == hashlib.sha256(raw).hexdigest()
        assert abs(g.byte_mean - sum(raw) / len(raw)) < 1e-9
        # decoded stats differ from raw-payload stats (44-byte RIFF header)
        assert g.n_bytes < len(bytes(row.payload))


def test_real_decoder_image_gated_on_pillow(spark):
    """Image decode is optional-import gated: without Pillow the stage
    raises an ImportError naming the missing lib; with Pillow it decodes."""
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    media = fake_media_frame(spark, n=3).filter("kind = 'image'")
    if not has_pil:
        with pytest.raises(Exception, match="Pillow"):
            extract_features(media, decoder="real").collect()
    else:  # pragma: no cover - container lacks Pillow
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (4, 3), (10, 20, 30)).save(buf, format="PNG")
        real = spark.createDataFrame(
            [("I000000", 0, "image", buf.getvalue(), 4, 3, None, None)],
            media.schema,
        )
        rows = extract_features(real, decoder="real").collect()
        assert rows[0].n_bytes == 4 * 3 * 3 and rows[0].feature_ok


def test_decoder_validation(spark):
    media = fake_media_frame(spark, n=3)
    with pytest.raises(ValueError):
        extract_features(media, decoder="png")


def test_frame_sample_plan(spark):
    media = fake_media_frame(spark, n=30)
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    # videos have 30 frames -> sampled idx 0,10,20
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    assert per and all(sorted(v) == [0, 10, 20] for v in per.values())


def test_sliding_counts_match_batch(spark, sf_dir):
    from bigdata_cookbook_spark.streaming.events import sliding_counts

    stream = stream_events(spark, sf_dir)
    out = _drain(sliding_counts(stream, "2 days", "1 day"), "slide_sink", spark)
    # batch equivalent: each event contributes to 2 overlapping windows
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.select(
            F.explode(
                F.array(
                    F.date_sub(F.to_date("ts"), 1),
                    F.to_date("ts"),
                )
            ).alias("win_start"),
            "event_type",
        )
        .groupBy("win_start", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    got = {(str(r.win_start), r.event_type): r.cnt for r in out.collect()}
    want = {(str(r.win_start), r.event_type): r.cnt for r in batch.collect()}
    assert got == want


def test_session_windows_merge_by_gap(spark, sf_dir):
    from bigdata_cookbook_spark.streaming.events import session_windows

    stream = stream_events(spark, sf_dir)
    out = _drain(session_windows(stream, gap="6 hours"), "sess_sink", spark)
    rows = out.collect()
    assert rows, "no sessions produced"
    ev_total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == ev_total  # every event in exactly one session
    # sessions for one user never overlap
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert e1 <= s2


def test_stateful_user_profile(spark, sf_dir):
    from bigdata_cookbook_spark.streaming.stateful import running_user_profile

    stream = stream_events(spark, sf_dir)
    out = _drain(running_user_profile(stream), "prof_sink", spark)
    rows = {r.user_id: r for r in out.collect()}
    assert rows, "no profiles emitted"
    # final profile per user must equal the batch aggregate
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    want = {r.user_id: r for r in batch.collect()}
    assert set(rows) == set(want)
    for uid, w in want.items():
        got = rows[uid]
        assert got.n_events == w.n_events
        assert abs(got.total_value - w.total_value) < 0.05


def test_corpus_filter_tier_runs_in_streaming(spark, tmp_path):
    """The quality/redaction tier is stateless projection, so the SAME
    column expressions must run under Structured Streaming unchanged —
    stream output == batch output over one drained file source. This is
    the continuous-ingest shape of the pretraining pipeline (filter at
    the edge, before anything lands)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bigdata_cookbook_spark.functions.text import (
        gopher_keep_expr,
        gopher_quality_exprs,
        redact_pii_expr,
        tokens_expr,
    )

    spool = str(tmp_path / "spool")
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox emailed fox@den.example.org today",
                "buy buy buy buy buy buy buy buy",
                "visit https://example.com/a and call 555-010-7788 now",
            ],
        }
    )
    spark.createDataFrame(rows).coalesce(1).write.parquet(spool)

    def tier(df):
        toksed = df.select("doc_id", "text", tokens_expr(F.col("text")).alias("toks"))
        m = gopher_quality_exprs(F.col("toks"), F.col("text"))
        return toksed.select(
            "doc_id",
            redact_pii_expr(F.col("text")).alias("redacted"),
            gopher_keep_expr(m).alias("keep"),
        )

    batch = {r["doc_id"]: (r["redacted"], r["keep"]) for r in tier(
        spark.read.parquet(spool)).collect()}

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(spool)
    out = str(tmp_path / "out")
    q = (
        tier(stream)
        .writeStream.format("memory")
        .queryName("corpus_filter_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", out)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["redacted"], r["keep"])
        for r in spark.sql("SELECT * FROM corpus_filter_stream").collect()
    }
    assert got == batch
    assert "<EMAIL>" in got[1][0] and got[1][1] is True
    assert got[2][1] is False  # repetition fails the keep rule
    assert "<URL>" in got[3][0] and "<PHONE>" in got[3][0]


def test_perplexity_scoring_runs_in_streaming(spark, tmp_path):
    """Train the char-bigram LM in batch, score a STREAM against it: the
    score path is a stream-static broadcast join + stateless projection,
    so drained-stream output must equal batch output — continuous
    quality-filtering at ingest with corpus statistics trained offline.
    Includes a doc with bigrams unseen at train time (smoothed c=0)."""
    import pandas as pd

    from bigdata_cookbook_spark.operators.corpus import (
        _char_bigrams,
        score_char_bigram_perplexity,
        train_char_bigram_lm,
    )

    train = spark.createDataFrame(
        [(100, "the quick brown fox"), (101, "the slow brown dog")],
        "doc_id long, text string",
    )
    cnt, tot = train_char_bigram_lm(train)
    cnt = cnt.cache()  # the persisted vocab-sized model table

    spool = str(tmp_path / "spool")
    incoming = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["the brown fox", "zzz@@@##"]}  # 2: unseen bigrams
    )
    spark.createDataFrame(incoming).coalesce(1).write.parquet(spool)

    batch_scores = {
        r.doc_id: (r.n_bigrams, r.perplexity)
        for r in score_char_bigram_perplexity(
            _char_bigrams(spark.read.parquet(spool)), cnt, tot
        ).collect()
    }

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(spool)
    q = (
        score_char_bigram_perplexity(_char_bigrams(stream), cnt, tot)
        .writeStream.format("memory")
        .queryName("ppl_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.n_bigrams, r.perplexity)
        for r in spark.sql("SELECT * FROM ppl_stream").collect()
    }
    assert got == batch_scores
    assert set(got) == {1, 2}
    # the unseen-bigram doc must score strictly worse than the in-domain one
    assert got[2][1] > got[1][1]


def test_streaming_corpus_dedup_matches_incremental_batch(spark, tmp_path):
    """Corpus dedup at ingest, streaming form: dropDuplicates on the
    text hash over a document stream == the incremental batch tier's
    kept set (first arrival wins under availableNow's in-order drain).
    This is the continuous-ingest twin of incremental_exact_dedup — the
    same hash rule, watermark-free because the corpus id space is
    unbounded (state is the hash set, exactly the batch state table)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bigdata_cookbook_spark.operators.dedup import incremental_exact_dedup

    spool = str(tmp_path / "spool")
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["alpha beta", "gamma", "alpha beta", "delta", "gamma"],
        }
    )
    spark.createDataFrame(rows).coalesce(1).write.parquet(spool)

    batch_kept = {
        r.doc_id
        for r in incremental_exact_dedup(spark.read.parquet(spool))["kept"].collect()
    }

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(spool)
    q = (
        stream.withColumn("text_hash", F.xxhash64("text"))
        .dropDuplicates(["text_hash"])
        .writeStream.format("memory")
        .queryName("corpus_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain within 120s"
    got = {
        r.doc_id for r in spark.sql("SELECT doc_id FROM corpus_dedup_stream").collect()
    }
    assert got == batch_kept == {1, 2, 4}
