"""Inverted-index build pipeline (SURVEY.md §3.2 Spark target lifecycle).

Replaces the reference's read-modify-write indexer
(``Indexer/Indexer.java:76-360``: per-doc threads + Mongo ``$push`` upserts +
a second full IDF pass, ``Indexer.java:391-548``) with a single declarative
DataFrame job:

    transcripts
      -> dense docID assignment (stable (conv_id, turn_idx) ordering)
      -> analyzer pandas UDF (Arrow-batched; tokenize/stop/stem)
      -> posexplode -> groupBy(doc_id, term) tf/positions  [A1]
      -> groupBy(doc_id) doc_len                            [A6]
      -> groupBy(term) df + idf in the SAME job             [A3+A5 — the
         reference's second pass disappears]
      -> repartition by (term-bucket, doc-range) -> applyInPandas encode
         (delta+varbyte, block-max metadata)                [S8 replacement]
      -> partitioned parquet segments + per-partition lineage/metrics
         manifest (checkpoint-resumable)

Scale notes (the 100 TB story):
* docID assignment is the classic two-phase range-partition + per-partition
  offsets scheme — no single-partition Window, no driver materialization.
* the doc-range axis (``drange``) doubles as head-term skew salting: a hot
  term's postings are split across every doc range, so no single encode task
  ever sees a whole head term's posting list. It is also the query-time
  parallel axis for block-max WAND (each range shard holds every query
  term's postings for that docID range -> document-at-a-time traversal is
  local to the shard).
* term buckets (``tbucket`` = crc32(term) % N) give partition pruning on
  point term lookups (the analog of the reference's Mongo btree on ``word``,
  ``Indexer/Indexer.java:57``).
"""

from __future__ import annotations

import math
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.analyzer import analyze
from .codec import BM25_K1, BM25_B, encode_postings

# Role weights: transcripts analog of title x3 / header x2 / body x1
# (Indexer/Indexer.java:36-38): user turns are the "title" of a conversation
# exchange, tool output is body, assistant in between.
ROLE_WEIGHTS = {"user": 3.0, "assistant": 1.0, "tool": 2.0}

N_TERM_BUCKETS = 64


def term_bucket_py(term: str, n_buckets: int = N_TERM_BUCKETS) -> int:
    """Portable term bucket: crc32 — identical in Python and Spark's crc32."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_bucket_col(col, n_buckets: int = N_TERM_BUCKETS):
    return (F.crc32(col.cast("string")) % n_buckets).cast("int")


# ---------------------------------------------------------------------------
# Dense docID assignment
# ---------------------------------------------------------------------------

def assign_doc_ids(
    df: DataFrame,
    num_partitions: int | None = None,
    cleanup: list | None = None,
) -> DataFrame:
    """Dense int64 ``doc_id`` following global (conv_id, turn_idx) order.

    Two-phase, cluster-scalable (no global Window): range-repartition on the
    ordering key, sort within partitions, count per partition, then add the
    cumulative offset inside an Arrow-batched mapInPandas. Replaces the
    reference's ``doc_<atomic counter>`` (``Indexer/Indexer.java:31,149``).
    """
    spark = df.sparkSession
    num_partitions = num_partitions or df.sparkSession.sparkContext.defaultParallelism

    ranged = (
        df.repartitionByRange(num_partitions, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
    )
    # The count pass and the assignment pass MUST see identical range
    # boundaries and partition layout. persist() pins them; without it AQE
    # replans the exchange per action (recomputed sampling / coalesced
    # partitions) and the two passes can disagree -> duplicate docIDs.
    # On a real cluster this would be a DISK_ONLY persist or a checkpoint.
    ranged = ranged.persist()
    if cleanup is not None:
        cleanup.append(ranged)
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", doc_id long"

    def add_ids(batches):
        seen = 0
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
            base = b_offsets.value[pid] + seen
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_id"] = np.arange(base, base + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    result = ranged.mapInPandas(add_ids, schema=out_schema)
    return result


# ---------------------------------------------------------------------------
# Analysis -> postings DataFrames
# ---------------------------------------------------------------------------

def with_terms(docs: DataFrame, stem: bool = True, positions: bool = True) -> DataFrame:
    """Add ``terms: array<string>`` via the Arrow-batched analyzer UDF."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def analyze_udf(texts: pd.Series) -> pd.Series:
        return pd.Series([analyze(t, stem=stem) for t in texts])

    return docs.withColumn("terms", analyze_udf(F.col("text")))


POSTINGS_SCHEMA = (
    "doc_id long, term string, tf int, positions binary, "
    "doc_len int, importance double"
)


def build_postings(docs_analyzed: DataFrame) -> DataFrame:
    """Analyzed docs (with a ``terms`` column) -> grouped postings.

    Returns ``(doc_id, term, tf, positions, doc_len, importance)`` — one row
    per (doc, term), the Spark analog of the reference's per-posting struct
    (``Indexer/Indexer.java:337-342``: frequency, positions, length,
    importance_score).

    The per-doc term aggregation (A1) happens INSIDE the Arrow-batched UDF —
    it is per-row work (a doc's postings derive only from that doc's token
    list, exactly the reference's in-memory ``Map<String,WordStats>``,
    ``Indexer.java:213-258``), so shipping 10M+ exploded token rows through
    a JVM hash-agg shuffle would be pure waste. The only shuffles left in
    the build are the intrinsic layout ones (bucket/range repartitions).

    ``positions`` is varbyte-encoded binary (codec.varbyte_encode) rather
    than array<int>: it caches/shuffles as a flat byte blob instead of
    millions of boxed JVM ints (decode with ``decode_positions``).
    """
    if "terms" not in docs_analyzed.columns:
        docs_analyzed = with_terms(docs_analyzed)

    from .codec import varbyte_encode

    def agg_stream(batches):
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [], "term": [], "tf": [], "positions": [],
                "doc_len": [], "importance": [],
            }
            for doc_id, role, terms in zip(
                pdf["doc_id"], pdf["role"], pdf["terms"]
            ):
                w = ROLE_WEIGHTS.get(role, 1.0)
                dl = len(terms)
                pos_by_term: dict[str, list[int]] = {}
                for pos, t in enumerate(terms):
                    pos_by_term.setdefault(t, []).append(pos)
                for t, positions in pos_by_term.items():
                    out["doc_id"].append(doc_id)
                    out["term"].append(t)
                    out["tf"].append(len(positions))
                    out["positions"].append(
                        varbyte_encode(np.asarray(positions, dtype=np.int64))
                    )
                    out["doc_len"].append(dl)
                    out["importance"].append(w * len(positions))
            yield pd.DataFrame(out)

    return docs_analyzed.select("doc_id", "role", "terms").mapInPandas(
        agg_stream, schema=POSTINGS_SCHEMA
    )


def decode_positions(buf: bytes, tf: int):
    """Decode a varbyte positions blob back to an int list."""
    from .codec import varbyte_decode

    return varbyte_decode(buf, tf)


def build_term_stats(postings: DataFrame, n_docs: int) -> DataFrame:
    """A3+A5 in one job: (term, df, idf, bm25_idf).

    ``idf`` is the reference formula ln(N/(1+df)) (``Indexer.java:384-388``);
    ``bm25_idf`` = ln(1+(N-df+0.5)/(df+0.5)) is the north-rule scoring.
    """
    return (
        postings.groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumn("idf", F.log(F.lit(float(n_docs)) / (F.col("df") + 1.0)))
        .withColumn(
            "bm25_idf",
            F.log(
                1.0
                + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
    )


# ---------------------------------------------------------------------------
# Encoded segment build (applyInPandas per (term, drange) group)
# ---------------------------------------------------------------------------

SEGMENT_SCHEMA = (
    "term string, drange long, tbucket int, df_local long, "
    "first_doc_id long, last_doc_id long, max_impact double, postings binary"
)


def encode_segments(
    postings: DataFrame,
    avgdl: float,
    drange_span: int,
    n_buckets: int = N_TERM_BUCKETS,
    num_partitions: int | None = None,
) -> DataFrame:
    """Group postings by (term, doc-range) and encode each group into one
    compressed binary segment row. ``drange`` = doc_id // drange_span.

    The (term, drange) grouping is the skew story: head terms split across
    all doc ranges, so the shuffle and the encode task sizes stay bounded by
    drange_span regardless of term df (SURVEY.md §4 "skew handling").

    Execution: repartition by group key + sortWithinPartitions, then ONE
    streaming mapInPandas pass that slices group boundaries with numpy and
    carries the split tail group across Arrow batches — avoiding
    applyInPandas' per-group invocation overhead (the Zipf tail has millions
    of tiny term groups at scale).
    """
    spark = postings.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    sorted_parts = (
        postings.withColumn(
            "drange", (F.col("doc_id") / F.lit(drange_span)).cast("long")
        )
        .select("term", "drange", "doc_id", "tf", "doc_len")
        .repartition(num_partitions, "term", "drange")
        .sortWithinPartitions("term", "drange", "doc_id")
    )

    def encode_stream(batches):
        def encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
            terms = pdf["term"].to_numpy()
            dranges = pdf["drange"].to_numpy(np.int64)
            ids = pdf["doc_id"].to_numpy(np.int64)
            tfs = pdf["tf"].to_numpy(np.int64)
            dls = pdf["doc_len"].to_numpy(np.int64)
            # group boundaries on the sorted (term, drange) stream
            change = np.flatnonzero(
                (terms[1:] != terms[:-1]) | (dranges[1:] != dranges[:-1])
            )
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [len(pdf)]))
            imp_all = tfs * (BM25_K1 + 1.0) / (
                tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls / avgdl)
            )
            rows = {k: [] for k in (
                "term", "drange", "tbucket", "df_local", "first_doc_id",
                "last_doc_id", "max_impact", "postings",
            )}
            for s, e in zip(starts, ends):
                term = terms[s]
                rows["term"].append(term)
                rows["drange"].append(int(dranges[s]))
                rows["tbucket"].append(term_bucket_py(term, n_buckets))
                rows["df_local"].append(int(e - s))
                rows["first_doc_id"].append(int(ids[s]))
                rows["last_doc_id"].append(int(ids[e - 1]))
                rows["max_impact"].append(float(imp_all[s:e].max()))
                rows["postings"].append(
                    encode_postings(ids[s:e], tfs[s:e], dls[s:e], avgdl)
                )
            return pd.DataFrame(rows)

        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            # hold back the trailing group: it may continue in the next batch
            last_term = pdf["term"].iloc[-1]
            last_dr = pdf["drange"].iloc[-1]
            tail = (pdf["term"] == last_term) & (pdf["drange"] == last_dr)
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield encode_groups(body)
        if carry is not None and len(carry):
            yield encode_groups(carry)

    return sorted_parts.mapInPandas(encode_stream, schema=SEGMENT_SCHEMA)


def positional_postings(postings: DataFrame) -> DataFrame:
    """Optional positional segment family (phrase queries): kept as a plain
    columnar table ``(term, doc_id, positions array<int>)`` — mirrors the
    reference keeping ``positions`` per posting (``Indexer.java:341``) as a
    separate concern from the scored index."""
    return postings.select(
        "term", "doc_id", "tf", "doc_len", "positions",
        term_bucket_col(F.col("term")).alias("tbucket"),
    )
