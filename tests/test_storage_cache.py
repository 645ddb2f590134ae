"""Reader memo (storage._read_cached): repeated reads reuse the constructed
DataFrame (no re-listing); ANY filesystem mutation of the artifact — full
overwrite, replace_dir, or a publish() dropping files into partition
subdirs — must invalidate via the mtime fingerprint."""

import time

from pyspark.sql import functions as F


def _mk_store(tmp_path):
    from search_engine_spark.index.storage import IndexStore

    return IndexStore(str(tmp_path / "ix"))


def test_repeat_reads_reuse_reader(spark, tmp_path):
    store = _mk_store(tmp_path)
    spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("term")
    ).write.parquet(store.postings_path)
    a = store.postings(spark)
    b = store.postings(spark)
    assert a is b


def test_overwrite_invalidates(spark, tmp_path):
    store = _mk_store(tmp_path)
    spark.range(5).select(F.col("id").alias("doc_id")).write.parquet(
        store.postings_path
    )
    a = store.postings(spark)
    assert a.count() == 5
    time.sleep(0.01)  # distinct mtime_ns even on coarse filesystems
    spark.range(9).select(F.col("id").alias("doc_id")).write.mode(
        "overwrite"
    ).parquet(store.postings_path)
    b = store.postings(spark)
    assert b is not a
    assert b.count() == 9


def test_publish_into_partition_subdir_invalidates(spark, tmp_path):
    store = _mk_store(tmp_path)
    spark.range(4).select(
        F.col("id").alias("doc_id"), (F.col("id") % 2).cast("int").alias("tbucket")
    ).write.partitionBy("tbucket").parquet(store.postings_path)
    assert store.postings(spark).count() == 4
    time.sleep(0.01)
    # streaming-append shape: new files appear INSIDE tbucket=N/ dirs
    staging = store.staging_dir("b1")
    spark.range(4, 6).select(
        F.col("id").alias("doc_id"), (F.col("id") % 2).cast("int").alias("tbucket")
    ).write.partitionBy("tbucket").parquet(staging)
    store.publish(staging, store.postings_path, "b1-")
    assert store.postings(spark).count() == 6
