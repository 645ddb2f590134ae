"""Incremental index append via Structured Streaming.

The reference re-indexes incrementally with a dirty flag + ``$pull`` cleanup
(``Indexer/Indexer.java:558-560,694-779``). The immutable-build equivalent
here: new transcript files (new Iceberg snapshots in production) arrive in a
watched directory; an ``availableNow`` streaming query drains them in
batches, and each batch appends a self-contained index delta:

* new docs get docIDs AFTER the current max (dense continuation) — within a
  batch the stable (conv_id, turn_idx) ordering is preserved;
* postings/positions append to the same bucket layout;
* term/corpus stats are recomputed from the merged postings (df and idf are
  global properties — the reference pays a full second pass every build,
  Indexer.java:391-548; here it's one cheap pruned-column aggregation);
* the batch's postings are encoded into a NEW segment chunk. Its doc ranges
  are disjoint from existing chunks (ids start past the old max), so
  block-max WAND simply sees extra per-(term,drange) iterators — queries
  stay correct with no segment rewrite.

Exactly-once per batch comes from the streaming checkpoint; the index-side
chunk manifest makes the append itself observable/resumable.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import TRANSCRIPTS_SCHEMA_DDL
from ..index.build import (
    N_TERM_BUCKETS,
    assign_doc_ids,
    build_postings,
    build_term_stats,
    encode_segments,
    term_bucket_col,
    with_terms,
)
from ..index.storage import IndexStore


def append_batch(spark: SparkSession, store: IndexStore, batch_df: DataFrame) -> int:
    """Append one micro-batch of new transcripts to an existing index.
    Returns the number of turns appended. (Called from foreachBatch; also
    directly testable as a plain batch function.)"""
    if batch_df.isEmpty():
        return 0
    cstats = store.corpus_stats()
    base = cstats["n_docs"]
    n_buckets = cstats["n_buckets"]
    drange_span = cstats["drange_span"]

    ids = assign_doc_ids(batch_df).withColumn(
        "doc_id", F.col("doc_id") + F.lit(base)
    )
    analyzed = with_terms(ids).persist()
    docs = (
        analyzed.withColumn("doc_len", F.size("terms"))
        .withColumn("content_hash", F.sha2(F.col("text"), 256))
        .drop("terms")
    )
    docs.write.mode("append").parquet(store.docs_path)

    postings_all = build_postings(analyzed).persist()
    (
        postings_all.select("term", "doc_id", "tf", "doc_len", "positions")
        .sortWithinPartitions("term")
        .write.mode("append")
        .parquet(store.positions_path)
    )
    compact = postings_all.drop("positions").withColumn(
        "tbucket", term_bucket_col(F.col("term"), n_buckets)
    )
    (
        compact.repartition(n_buckets, "tbucket")
        .write.mode("append")
        .partitionBy("tbucket")
        .parquet(store.postings_path)
    )
    n_new = analyzed.count()
    analyzed.unpersist()

    # global stats: recompute from the merged postings (pruned columns)
    merged = store.postings(spark)
    all_docs = store.docs(spark)
    crow = all_docs.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = crow["n"], float(crow["avgdl"] or 0.0)
    term_stats = build_term_stats(merged, n_docs).withColumn(
        "tbucket", term_bucket_col(F.col("term"), n_buckets)
    )
    (
        term_stats.repartition(n_buckets, "tbucket")
        .write.mode("overwrite")
        .partitionBy("tbucket")
        .parquet(store.term_stats_path)
    )

    # encode the delta into a new chunk (doc ranges disjoint from old chunks)
    new_chunk = max((m["chunk"] for m in store.manifests()), default=-1) + 1
    segs = encode_segments(compact, avgdl, drange_span, n_buckets).persist()
    chunk_path = f"{store.segments_path}/chunk={new_chunk}"
    segs.write.mode("overwrite").partitionBy("tbucket").parquet(chunk_path)
    m = segs.agg(
        F.count("*").alias("n_segments"),
        F.sum("df_local").alias("n_postings"),
        F.countDistinct("term").alias("n_terms"),
        F.countDistinct("drange").alias("n_dranges"),
        F.sum(F.length("postings")).alias("bytes"),
        F.min("first_doc_id").alias("min_doc_id"),
        F.max("last_doc_id").alias("max_doc_id"),
    ).collect()[0]
    store.write_manifest(
        new_chunk,
        {
            "chunk": new_chunk,
            "input": "transcripts-stream",
            "drange_span": drange_span,
            "n_segments": m["n_segments"],
            "n_postings": int(m["n_postings"] or 0),
            "n_terms": m["n_terms"],
            "n_dranges": m["n_dranges"],
            "bytes": int(m["bytes"] or 0),
            "min_doc_id": m["min_doc_id"],
            "max_doc_id": m["max_doc_id"],
            "completed_unix": time.time(),
        },
    )
    segs.unpersist()
    postings_all.unpersist()

    cstats.update(
        {"n_docs": n_docs, "avgdl": avgdl, "n_chunks": new_chunk + 1,
         "last_append_unix": time.time()}
    )
    store.write_corpus_stats(cstats)
    return n_new


def incremental_index_stream(
    spark: SparkSession,
    store: IndexStore,
    input_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Watch ``input_path`` for new transcript parquet files and append each
    micro-batch to the index. ``availableNow`` drains what exists and stops
    (the snapshot-catchup pattern); pass False for a continuous stream."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA_DDL)
        .parquet(input_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(spark, store, batch_df)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
