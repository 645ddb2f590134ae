"""Conversation-level transcript analytics (payload axis: agent transcripts).

Operators over the engine's canonical transcript shape — ``(conv_id string,
turn_idx int, role string, text string, tool string, ts timestamp)`` — the
input contract every index build consumes (``corpus.py``, BASELINE.json
``input_hint``). The reference engine has no conversation concept (it
indexes flat crawled pages, ``Indexer/Indexer.java:60-85``); these are the
transcript-pipeline operations a 10^12-turn corpus needs before/alongside
indexing: per-conversation rollups, whole-conversation dedup, role-flow
statistics, and tool-usage accounting.

Scale notes (100 TB):
* every operator is ONE shuffle on ``conv_id`` (hash agg or window) —
  map-side combine applies to the pure aggs; the window ops sort within
  the conv partition only. Conversations are bounded (10^2..10^4 turns),
  so no per-group state ever approaches executor memory.
* ``conv_fingerprints`` needs the turn texts of one conversation in
  order — collect_list + array_sort keeps it a single ObjectHashAggregate
  over bounded groups; the alternative (window + concat) would shuffle
  the same bytes without the map-side size cap.
* nothing touches the driver; all expressions are Catalyst built-ins
  (zero Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# documents -> turns derivation constants (shared with the DuckDB oracle
# literals in __spark_entry__.py — change both together)
TURN_WORDS = 8
DERIVE_EPOCH = "2026-01-01 00:00:00"
_TOOLS = ("search", "code", "browse")
_SEP = "\x1f"  # unit separator between turn texts in a fingerprint


def derive_turns(docs: DataFrame, turn_words: int = TURN_WORDS) -> DataFrame:
    """Deterministically reshape the ``documents`` table into the canonical
    transcript schema: each document becomes one conversation whose text is
    chunked into ``turn_words``-word turns; role/tool/ts are pure functions
    of (doc_id, turn_idx). Exists so conversation operators can be
    hash-checked against a DuckDB oracle that performs the identical
    derivation in SQL — production pipelines feed real transcript tables
    (``corpus.py`` shape) to the same operators."""
    toks = F.split(F.col("text"), r"\s+")
    base = docs.select(
        F.col("doc_id"),
        toks.alias("toks"),
        F.greatest(
            F.lit(1),
            F.ceil(F.size(toks) / F.lit(float(turn_words))).cast("int"),
        ).alias("n_turns"),
    )
    t = base.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    i = F.col("turn_idx")
    return t.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        i.cast("int").alias("turn_idx"),
        F.when(i % 5 == 4, F.lit("tool"))
        .when(i % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.array_join(
            F.slice(F.col("toks"), i * turn_words + 1, turn_words), " "
        ).alias("text"),
        F.when(
            i % 5 == 4,
            F.element_at(
                F.array(*[F.lit(x) for x in _TOOLS]),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ),
        ).alias("tool"),
        F.expr(
            # quadratic turn offsets -> inter-turn gaps grow with position
            # (2i+1 s), so latency-style stats aggregate real variance
            f"timestamp'{DERIVE_EPOCH}' + make_interval(0, 0, 0, 0, 0, 0, "
            "doc_id * 60 + turn_idx * turn_idx)"
        ).alias("ts"),
    )


def conv_stats(turns: DataFrame) -> DataFrame:
    """Per-conversation rollup: turn counts by role, tool-call count,
    distinct tools, total whitespace words, and wall-clock duration.
    One hash aggregation on conv_id (map-side combinable)."""
    words = F.size(F.split(F.col("text"), r"\s+"))
    return turns.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("long")
        .alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .cast("long")
        .alias("n_assistant"),
        F.count("tool").cast("long").alias("n_tool_calls"),
        F.countDistinct("tool").cast("long").alias("n_distinct_tools"),
        F.sum(words).cast("long").alias("total_words"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("duration_sec"),
    )


def conv_fingerprints(turns: DataFrame) -> DataFrame:
    """Whole-conversation dedup key: sha256 over the turn texts joined in
    turn order with a unit separator (order-sensitive — the same turns
    permuted are a DIFFERENT conversation), plus the size of each
    fingerprint's duplicate group. Downstream dedup keeps
    ``dup_group_size = 1`` rows or one representative per group (same
    min-keeper pattern as ``dedup.exact_duplicates``)."""
    ordered = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
            lambda x: x["text"],
        ),
        _SEP,
    )
    fps = turns.groupBy("conv_id").agg(F.sha2(ordered, 256).alias("fp"))
    return fps.withColumn(
        "dup_group_size",
        F.count("*").over(Window.partitionBy("fp")).cast("long"),
    )


def role_transitions(turns: DataFrame) -> DataFrame:
    """Corpus-wide role-flow matrix: counts of consecutive
    (role[i] -> role[i+1]) pairs within each conversation — the Markov
    transition table of the agent loop (user->assistant->tool->...).
    Window lag inside the conv partition, then a global count agg."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (
        turns.select("conv_id", "turn_idx", "role")
        .withColumn("from_role", F.lag("role").over(w))
        .filter(F.col("from_role").isNotNull())
    )
    return pairs.groupBy(
        "from_role", F.col("role").alias("to_role")
    ).agg(F.count("*").cast("long").alias("n"))


CTX_SEP = "\x1e"  # record separator between context turns


def context_windows(turns: DataFrame, k: int = 3,
                    sep: str = CTX_SEP) -> DataFrame:
    """Training-sample extraction: one row per ASSISTANT turn with the
    previous ``k`` turns (any role) joined in order as ``context`` and the
    turn text as ``target`` — the (context -> response) pairs a
    conversational fine-tuning pipeline materializes from raw transcripts.
    Conversation-opening assistant turns keep an empty context.

    One shuffle on conv_id; the sliding frame is a bounded window (``k``
    rows), so state per row is O(k) regardless of conversation length."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-k, -1)
    )
    ctx = F.array_join(F.collect_list("text").over(w), sep)
    return (
        turns.withColumn("context", ctx)
        .filter(F.col("role") == "assistant")
        .select(
            "conv_id",
            "turn_idx",
            "context",
            F.col("text").alias("target"),
        )
    )


def tool_usage(turns: DataFrame) -> DataFrame:
    """Per-tool accounting: call count, conversations reached, mean words
    in the tool turn, and mean seconds until the NEXT turn (the tool's
    observed latency in the transcript; conversation-final tool calls have
    no next turn and drop out of the mean, in both engines)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp(F.col("ts"))
    words = F.size(F.split(F.col("text"), r"\s+"))
    t = (
        turns.withColumn("gap_sec", gap)
        .withColumn("turn_words", words)
        .filter(F.col("tool").isNotNull())
    )
    return t.groupBy("tool").agg(
        F.count("*").cast("long").alias("n_calls"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
        F.round(F.avg("turn_words"), 6).alias("avg_turn_words"),
        F.round(F.avg("gap_sec"), 6).alias("avg_gap_next_sec"),
    )
