"""Streaming face, skew salting, model-UDF classifier."""

import time

from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.fixtures import transcripts_df
from icdar_2019_rrc_sroie_spark.operators.model_udf import classify_lines_model
from icdar_2019_rrc_sroie_spark.operators.skew import salted_count, salted_sum
from icdar_2019_rrc_sroie_spark.plans.extraction import extract_spans, turn_lines


def test_streaming_spans_matches_batch(spark, tmp_path):
    """The flagship plan is stateless → identical results under
    Structured Streaming micro-batches."""
    src = str(tmp_path / "src")
    t = transcripts_df(spark, n_convs=12)
    t.write.parquet(src)
    batch_rows = sorted(map(tuple, extract_spans(
        spark.read.parquet(src)).collect()))

    from icdar_2019_rrc_sroie_spark.streaming.stream_extract import (
        streaming_spans,
    )

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_spans(stream)
        .writeStream.format("memory")
        .queryName("spans_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream not finished in 600s"
    got = sorted(map(tuple, spark.sql(
        "select * from spans_stream").collect()))
    assert got == batch_rows


def test_windowed_span_counts_stream(spark, tmp_path):
    from icdar_2019_rrc_sroie_spark.streaming.stream_extract import (
        windowed_span_counts,
    )

    src = str(tmp_path / "src2")
    transcripts_df(spark, n_convs=8).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = (
        windowed_span_counts(stream, window="10 minutes",
                             watermark="5 minutes")
        .writeStream.format("memory")
        .queryName("span_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream not finished in 600s"
    # append mode only emits closed windows; just assert the query ran
    # and the schema is right
    cols = spark.sql("select * from span_counts").columns
    assert cols == ["window", "label", "n_spans"]


def test_salted_agg_matches_plain(spark):
    t = transcripts_df(spark, n_convs=30)
    plain = {r["conv_id"]: r["n"] for r in
             t.groupBy("conv_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
             .collect()}
    salted = {r["conv_id"]: r["n"] for r in
              salted_count(t, "conv_id").collect()}
    assert salted == plain

    plain_sum = {r["conv_id"]: r["s"] for r in
                 t.groupBy("conv_id").agg(F.sum("turn_idx").alias("s"))
                 .collect()}
    got_sum = {r["conv_id"]: r["total"] for r in
               salted_sum(t, "conv_id", "turn_idx").collect()}
    assert got_sum == plain_sum


def test_model_udf_classifier(spark):
    lines = turn_lines(transcripts_df(spark, n_convs=6))
    out = classify_lines_model(lines)
    rows = out.collect()
    assert len(rows) == lines.count()
    assert all(0 <= r["cls"] <= 4 for r in rows)
    assert all(0.0 < r["prob"] <= 1.0 for r in rows)
    # deterministic across runs (broadcast params are pure)
    again = classify_lines_model(lines).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # total lines get labeled total by the keyword model
    by_line = {(r["conv_id"], r["turn_idx"], r["line_idx"]): r["cls"]
               for r in rows}
    texts = {(r["conv_id"], r["turn_idx"], r["line_idx"]): r["text"]
             for r in lines.collect()}
    total_lines = [k for k, v in texts.items() if v.startswith("TOTAL RM")]
    assert total_lines
    from icdar_2019_rrc_sroie_spark.constants import LABELS_CLASSES
    hits = sum(by_line[k] == LABELS_CLASSES["total"] for k in total_lines)
    assert hits / len(total_lines) > 0.9


def test_sessionize_conversations_stateful(spark, tmp_path):
    """applyInPandasWithState session assembly: feeding two micro-batches
    where batch 2's event time is far past batch 1's conversations must
    close and emit batch 1's sessions with correct turn counts."""
    import pandas as pd
    from datetime import datetime

    from icdar_2019_rrc_sroie_spark.streaming.stream_extract import (
        sessionize_conversations,
    )

    src = str(tmp_path / "sess_src")
    b1 = pd.DataFrame([
        {"conv_id": "a", "turn_idx": i, "role": r, "text": "t",
         "tool": None, "ts": datetime(2024, 1, 1, 0, 0, 10 * i)}
        for i, r in enumerate(["user", "assistant", "tool"])
    ] + [
        {"conv_id": "b", "turn_idx": 0, "role": "user", "text": "t",
         "tool": None, "ts": datetime(2024, 1, 1, 0, 1, 0)},
    ])
    # batch 2: hours later → watermark passes a/b timeout
    b2 = pd.DataFrame([
        {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "t",
         "tool": None, "ts": datetime(2024, 1, 1, 6, 0, 0)},
    ])
    sdf1 = spark.createDataFrame(b1)
    # coalesce(1): one file per batch dir, so maxFilesPerTrigger=1
    # yields exactly two micro-batches — a multi-part p1 would split
    # into same-mtime micro-batches whose order ties nondeterministically
    sdf1.coalesce(1).write.parquet(src + "/p1")
    stream = spark.readStream.schema(sdf1.schema) \
        .option("maxFilesPerTrigger", "1").parquet(src + "/*")
    spark.createDataFrame(b2).coalesce(1).write.parquet(src + "/p2")
    # FileStreamSource orders micro-batches by file modification time;
    # sub-second writes can tie and flip the order, letting batch 2's
    # event time advance the watermark past batch 1 (sessions dropped
    # as late). Pin p1 strictly before p2.
    import glob
    import os
    for d, ts in ((src + "/p1", 1_000_000_000), (src + "/p2", 2_000_000_000)):
        for f in glob.glob(d + "/*"):
            os.utime(f, (ts, ts))
    q = (
        sessionize_conversations(stream, gap="30 minutes",
                                 watermark="1 minute")
        .writeStream.format("memory").queryName("sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    # availableNow terminates on its own; a silent timeout here used to
    # read the memory sink half-filled under full-suite host contention
    finished = q.awaitTermination(600)
    assert finished, "streaming query still running after 600s"
    rows = {r["conv_id"]: r for r in
            spark.sql("select * from sessions").collect()}
    assert "a" in rows and "b" in rows and "c" not in rows
    assert rows["a"]["n_turns"] == 3 and rows["a"]["n_tool_turns"] == 1
    assert rows["b"]["n_turns"] == 1
    assert rows["a"]["first_ts"] == datetime(2024, 1, 1, 0, 0, 0)
    assert rows["a"]["last_ts"] == datetime(2024, 1, 1, 0, 0, 20)


def test_sessionize_checkpoint_restart(spark, tmp_path):
    """Exactly-once recovery of the stateful sessionizer: process
    batch 1 under a checkpointLocation, STOP the query, add batch 2,
    restart with the same checkpoint — the restarted query must
    resume from persisted state (conv 'a' spans both incarnations:
    turns from batch 1 and batch 2 land in ONE session row), and no
    batch-1 session is emitted twice."""
    import glob
    import os
    from datetime import datetime

    import pandas as pd

    from icdar_2019_rrc_sroie_spark.streaming.stream_extract import (
        sessionize_conversations,
    )

    src = str(tmp_path / "ckpt_src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "ckpt_sink")
    b1 = pd.DataFrame([
        {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "t",
         "tool": None, "ts": datetime(2024, 1, 1, 0, 0, 0)},
        {"conv_id": "a", "turn_idx": 1, "role": "tool", "text": "t",
         "tool": "x", "ts": datetime(2024, 1, 1, 0, 0, 10)},
    ])
    sdf1 = spark.createDataFrame(b1)
    sdf1.coalesce(1).write.parquet(src + "/p1")

    def run_once():
        # file sink: the one sink kind that supports restart-from-
        # checkpoint (memory sink refuses recovery)
        stream = spark.readStream.schema(sdf1.schema) \
            .option("maxFilesPerTrigger", "1").parquet(src + "/*")
        q = (
            sessionize_conversations(stream, gap="30 minutes",
                                     watermark="1 minute")
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(600)

    run_once()
    # nothing closed yet: watermark hasn't passed a's timeout
    assert spark.read.parquet(sink).count() == 0

    # after the stop, three single-file micro-batches in pinned order
    # (the file source orders batches by mtime; one file per batch via
    # coalesce(1) keeps watermark progression deterministic):
    #   p2: one more 'a' turn inside the gap  (merges into state)
    #   p3: far-future event                  (advances the watermark)
    #   p4: another far-future event          (its batch fires a's
    #       event-time timeout against the now-advanced watermark)
    def one_row_batch(sub, conv, ts, mtime):
        pdf = pd.DataFrame([
            {"conv_id": conv, "turn_idx": 0, "role": "user", "text": "t",
             "tool": None, "ts": ts}])
        # pin the schema: an all-None pandas 'tool' column would
        # otherwise infer a non-string parquet type
        spark.createDataFrame(pdf, schema=sdf1.schema).coalesce(1) \
            .write.parquet(src + sub)
        for f in glob.glob(src + sub + "/*"):
            os.utime(f, (mtime, mtime))

    for f in glob.glob(src + "/p1/*"):
        os.utime(f, (1_000_000_000, 1_000_000_000))
    one_row_batch("/p2", "a", datetime(2024, 1, 1, 0, 0, 20),
                  2_000_000_000)
    one_row_batch("/p3", "z", datetime(2024, 1, 1, 6, 0, 0),
                  3_000_000_000)
    one_row_batch("/p4", "z", datetime(2024, 1, 1, 6, 30, 0),
                  4_000_000_000)

    run_once()
    rows = spark.read.parquet(sink).collect()
    sessions = {r["conv_id"]: r for r in rows}
    assert list(sessions) == ["a"], rows
    # state crossed the restart: all 3 turns (2 pre-stop + 1 post) in
    # ONE session — proof the checkpoint carried the per-key state
    assert sessions["a"]["n_turns"] == 3
    assert sessions["a"]["n_tool_turns"] == 1
    assert sessions["a"]["last_ts"] == datetime(2024, 1, 1, 0, 0, 20)


def test_streaming_dedup_suppresses_cross_batch_duplicates(spark, tmp_path):
    """streaming_dedup: one emission per content fingerprint across
    micro-batch boundaries; normalized (whitespace/case) variants
    collapse; state is keyed on the fingerprint with watermark-bounded
    eviction."""
    import glob
    import os
    from datetime import datetime

    import pandas as pd

    from icdar_2019_rrc_sroie_spark.streaming.stream_extract import (
        streaming_dedup,
    )

    src = str(tmp_path / "dedup_src")
    b1 = pd.DataFrame([
        {"doc_id": 1, "text": "hello world", "ts": datetime(2024, 1, 1, 0, 0, 0)},
        {"doc_id": 2, "text": "HELLO   world", "ts": datetime(2024, 1, 1, 0, 0, 1)},
        {"doc_id": 3, "text": "something else", "ts": datetime(2024, 1, 1, 0, 0, 2)},
    ])
    b2 = pd.DataFrame([
        {"doc_id": 4, "text": "hello  WORLD", "ts": datetime(2024, 1, 1, 0, 1, 0)},
        {"doc_id": 5, "text": "brand new doc", "ts": datetime(2024, 1, 1, 0, 1, 1)},
    ])
    sdf1 = spark.createDataFrame(b1)
    sdf1.coalesce(1).write.parquet(src + "/p1")
    stream = spark.readStream.schema(sdf1.schema) \
        .option("maxFilesPerTrigger", "1").parquet(src + "/*")
    spark.createDataFrame(b2).coalesce(1).write.parquet(src + "/p2")
    for d, ts in ((src + "/p1", 1_000_000_000), (src + "/p2", 2_000_000_000)):
        for f in glob.glob(d + "/*"):
            os.utime(f, (ts, ts))

    q = (streaming_dedup(stream, watermark="10 minutes")
         .writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(600)
    rows = spark.sql("select * from dedup_stream").collect()
    by_id = {r["doc_id"]: r["fp"] for r in rows}
    # exactly one survivor per fingerprint: {1,2} collapse, 4 is a
    # cross-batch duplicate of that fp (suppressed), 3 and 5 unique
    assert len(rows) == 3
    assert sorted(by_id) in ([1, 3, 5], [2, 3, 5])
    assert 4 not in by_id
    assert len({r["fp"] for r in rows}) == 3


def test_enrich_spans_stream_static_join(spark, tmp_path):
    """Stream-static broadcast enrichment: every streamed span row
    carries its label's static weight; labels missing from the dim
    survive with null (left join)."""
    from icdar_2019_rrc_sroie_spark.streaming.stream_extract import (
        enrich_spans_stream,
    )

    src = str(tmp_path / "enrich_src")
    transcripts_df(spark, n_convs=6).write.parquet(src)
    dim = spark.createDataFrame(
        [("date", 4.0), ("total", 9.0), ("company", 2.0)],
        "label string, weight double")
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = (enrich_spans_stream(stream, dim)
         .writeStream.format("memory").queryName("enriched")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(600)
    rows = spark.sql("select * from enriched").collect()
    assert rows
    weights = {"date": 4.0, "total": 9.0, "company": 2.0}
    for r in rows:
        assert r["weight"] == weights.get(r["label"]), r
    # batch parity: same rows as the batch plan + batch join
    from icdar_2019_rrc_sroie_spark.plans.extraction import extract_spans
    from pyspark.sql import functions as F2

    batch = extract_spans(spark.read.parquet(src)) \
        .join(F2.broadcast(dim), "label", "left")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, batch.collect()))
