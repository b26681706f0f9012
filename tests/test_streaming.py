"""Streaming tier rollup: finite replay equals the batch rollup."""

import os
import tempfile

from mpnsm_spark.generator import generate_transcripts, with_value
from mpnsm_spark.schema import TRANSCRIPT_SCHEMA
from mpnsm_spark.streaming.rollup_stream import batch_equivalent, run_stream_to_memory

from .oracle_pandas import compare_frames

FLOATS = ("value_sum", "value_min", "value_max", "value_avg", "first_value", "last_value")


def test_streaming_rollup_equals_batch(spark):
    raw = with_value(
        generate_transcripts(spark, n_convs=15, n_turns=1200, seed=42)
    ).cache()
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "stream_src")
        # multiple files → multiple micro-batch candidates under availableNow
        raw.drop("value").repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        from mpnsm_spark.generator import with_value as wv

        from mpnsm_spark.operators.rollup import distinct_tool_vocab

        vocab = distinct_tool_vocab(raw)
        got = run_stream_to_memory(
            spark, wv(stream), "t1m_stream_test", tool_vocab=vocab
        ).toPandas()
    want = batch_equivalent(raw, vocab).toPandas()
    compare_frames(got, want, ["conv_id", "bucket_start"], float_cols=FLOATS)


def test_streaming_rollup_out_of_order_arrival(spark):
    """Rows arriving shuffled across micro-batches aggregate identically
    (state keyed on (conv, window); first/last bound to turn_idx)."""
    from pyspark.sql import functions as F

    raw = with_value(
        generate_transcripts(spark, n_convs=8, n_turns=600, seed=7)
    ).cache()
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "stream_src2")
        raw.drop("value").orderBy(F.xxhash64("text")).repartition(6).write.mode(
            "overwrite"
        ).parquet(src)
        stream = (
            spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        from mpnsm_spark.generator import with_value as wv

        got = run_stream_to_memory(spark, wv(stream), "t1m_stream_test2").toPandas()
    want = batch_equivalent(raw).toPandas()  # vocab-less fallback path
    compare_frames(got, want, ["conv_id", "bucket_start"], float_cols=FLOATS)
