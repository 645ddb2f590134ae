"""Index artifact layout + readers.

On a production cluster these tables are Iceberg (``writeTo(...).append()``,
``MERGE INTO`` for re-index — SURVEY.md §1.3); the sandbox has no Iceberg
runtime jar, so the same layout is written as partitioned parquet behind this
abstraction. Layout under ``index_dir``:

    docs/                 doc registry: doc_id, conv_id, turn_idx, role, text,
                          tool, ts, doc_len, content_hash
    postings/             ONE flat postings table (term, doc_id, tf,
                          positions, doc_len, importance) partitioned by
                          tbucket: the DataFrame-path index, the stats
                          source, AND the positional (phrase) family —
                          columnar storage means scored readers never pay
                          for the positions blob (column pruning)
    segments/chunk=N/     compressed block-max segments (codec.py) — the WAND
                          path; chunked by drange for checkpoint-resume
    stats/terms/          (term, df, idf, bm25_idf, tbucket) part. by tbucket
    stats/corpus.json     {n_docs, avgdl, drange_span, n_buckets, n_chunks}
    manifest/chunk_N.json per-chunk lineage + metrics (A11 analog: counters
                          the reference keeps as AtomicInteger,
                          WebCrawler.java:27-29)
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


# canonical artifact schemas — used only as empty-read fallbacks (a zero-doc
# corpus writes directories with no parquet part files)
DOCS_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, doc_id long, doc_len int, content_hash string"
)
# ONE unified postings table serves the scored paths (which never read the
# fat positions blob — parquet column pruning) and the phrase path
POSTINGS_DDL = (
    "doc_id long, term string, tf int, positions binary, doc_len int, "
    "importance double, tbucket int"
)
POSITIONS_DDL = POSTINGS_DDL
TERM_STATS_DDL = (
    "term string, df long, cf long, idf double, bm25_idf double, tbucket int"
)
SEGMENTS_DDL = (
    "term string, drange long, df_local long, first_doc_id long, "
    "last_doc_id long, max_impact double, postings binary, "
    "positions binary, tbucket int, chunk int"
)


def _read_or_empty(spark: SparkSession, path: str, fallback_ddl: str) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if "UNABLE_TO_INFER_SCHEMA" in str(e) or "PATH_NOT_FOUND" in str(e):
            return spark.createDataFrame([], fallback_ddl)
        raise


# ---------------------------------------------------------------------------
# Reader memo: `spark.read.parquet` costs ~0.2 s per call on a built index
# (recursive file listing + schema inference from footers) and every query
# constructs 2-3 readers — ~40% of a served query's latency was re-listing
# unchanged directories. The memo caches the constructed DataFrame (the
# UNRESOLVED plan + file index — never rows; every action still computes
# from parquet) per (session, path), invalidated by a shallow filesystem
# fingerprint: names, sizes, and mtimes of the artifact's dirs AND files
# (single-digit ms; see _dir_fingerprint). Every mutation path changes
# it — full overwrites and replace_dir swap the file set; streaming
# publish() adds prefix-named files into tbucket=N/ subdirs; unpublish
# removes them.
# This is the open-IndexReader analog every production engine holds.
# ---------------------------------------------------------------------------

_READER_CACHE: dict[tuple, tuple[tuple, DataFrame]] = {}
_READER_CACHE_MAX = 64


def _dir_fingerprint(path: str) -> tuple | None:
    """Shallow filesystem fingerprint: (name, size, mtime_ns) of every
    file and dir down to the deepest partition level the artifacts use
    (segments nest chunk=N/tbucket=M). File names+sizes are included, not
    just dir mtimes, so two mutations landing inside one mtime granule
    around a read still change the fingerprint unless they also preserve
    every file name and size (~a thousand os.stat calls on a built index,
    single-digit ms — vs ~200 ms for spark.read.parquet's listing +
    schema inference)."""
    import os

    root = Path(path)
    try:
        st = root.stat()
    except OSError:
        return None
    parts: list = [st.st_mtime_ns]

    def scan(d, depth: int) -> None:
        with os.scandir(d) as it:
            for e in sorted(it, key=lambda x: x.name):
                try:
                    est = e.stat(follow_symlinks=False)
                except OSError:
                    continue
                if e.is_dir(follow_symlinks=False):
                    parts.append((depth, e.name, est.st_mtime_ns))
                    if depth < 2:
                        scan(e.path, depth + 1)
                else:
                    parts.append(
                        (depth, e.name, est.st_size, est.st_mtime_ns)
                    )

    try:
        scan(root, 0)
    except OSError:
        return None
    return tuple(parts)


def _read_cached(spark: SparkSession, path: str, fallback_ddl: str) -> DataFrame:
    fp = _dir_fingerprint(path)
    if fp is None:  # missing dir: empty-frame fallback, never cached
        return _read_or_empty(spark, path, fallback_ddl)
    key = (spark.sparkContext.applicationId, path)
    hit = _READER_CACHE.get(key)
    if hit is not None and hit[0] == fp:
        return hit[1]
    df = _read_or_empty(spark, path, fallback_ddl)
    while len(_READER_CACHE) >= _READER_CACHE_MAX:
        _READER_CACHE.pop(next(iter(_READER_CACHE)))
    _READER_CACHE[key] = (fp, df)
    return df


class IndexStore:
    def __init__(self, index_dir: str):
        self.dir = Path(index_dir)

    # -- paths ---------------------------------------------------------
    @property
    def docs_path(self) -> str:
        return str(self.dir / "docs")

    @property
    def postings_path(self) -> str:
        return str(self.dir / "postings")

    @property
    def positions_path(self) -> str:
        # the positional family lives in the unified postings table
        return self.postings_path

    @property
    def segments_path(self) -> str:
        return str(self.dir / "segments")

    @property
    def term_stats_path(self) -> str:
        return str(self.dir / "stats" / "terms")

    @property
    def corpus_stats_path(self) -> Path:
        return self.dir / "stats" / "corpus.json"

    @property
    def manifest_dir(self) -> Path:
        return self.dir / "manifest"

    @property
    def gram_index_path(self) -> str:
        """Conventional in-store location of the persisted q-gram
        dictionary index (query/fuzzy_index.py). The serve path routes
        through it automatically when its epoch stamp matches the store's
        current stats epoch."""
        return str(self.dir / "gram_index")

    # -- stage completion markers ---------------------------------------
    def stage_done(self, rel: str) -> bool:
        return (self.dir / rel / "_SUCCESS").exists()

    def chunk_done(self, chunk: int) -> bool:
        return (
            self.dir / "segments" / f"chunk={chunk}" / "_SUCCESS"
        ).exists() and (self.manifest_dir / f"chunk_{chunk}.json").exists()

    # -- readers ---------------------------------------------------------
    # All readers go through the fingerprint-invalidated memo (see
    # _read_cached): repeated queries skip the per-call file listing +
    # schema inference; any artifact mutation is picked up via dir mtimes.
    def docs(self, spark: SparkSession) -> DataFrame:
        return _read_cached(spark, self.docs_path, DOCS_DDL)

    def postings(self, spark: SparkSession) -> DataFrame:
        return _read_cached(spark, self.postings_path, POSTINGS_DDL)

    def positions(self, spark: SparkSession) -> DataFrame:
        """Positional view (phrase queries) — same unified table; kept as a
        named reader so call sites say what they mean."""
        return _read_cached(spark, self.positions_path, POSITIONS_DDL)

    def segments(self, spark: SparkSession) -> DataFrame:
        # chunk=N/tbucket=M dirs are discovered as partition columns ->
        # directory-level pruning on term lookups
        return _read_cached(spark, self.segments_path, SEGMENTS_DDL)

    def term_stats(self, spark: SparkSession) -> DataFrame:
        return _read_cached(spark, self.term_stats_path, TERM_STATS_DDL)

    def corpus_stats(self) -> dict:
        return json.loads(self.corpus_stats_path.read_text())

    def write_corpus_stats(self, stats: dict) -> None:
        self.corpus_stats_path.parent.mkdir(parents=True, exist_ok=True)
        self.corpus_stats_path.write_text(json.dumps(stats, indent=2))

    def write_manifest(self, chunk: int, payload: dict) -> None:
        self.manifest_dir.mkdir(parents=True, exist_ok=True)
        tmp = self.manifest_dir / f".chunk_{chunk}.json.tmp"
        tmp.write_text(json.dumps(payload, indent=2))
        tmp.rename(self.manifest_dir / f"chunk_{chunk}.json")

    def manifests(self) -> list[dict]:
        out = []
        if self.manifest_dir.exists():
            for p in sorted(self.manifest_dir.glob("chunk_*.json")):
                out.append(json.loads(p.read_text()))
        return out

    # -- streaming-append ledger (idempotent foreachBatch) -----------------
    # foreachBatch gives at-least-once delivery: a crash between the batch's
    # writes and the streaming checkpoint commit re-runs the whole batch.
    # The ledger records committed batch_ids (skip on replay) and inflight
    # batch state (docID base + chunk number pinned at first attempt), so a
    # retried partial batch republishes the SAME artifacts instead of
    # appending duplicates. On Iceberg this is the snapshot-commit property;
    # on the parquet fallback it's tmp-write + rename (both atomic moves).

    @property
    def ledger_path(self) -> Path:
        return self.dir / "stats" / "stream_ledger.json"

    def read_ledger(self) -> dict:
        if self.ledger_path.exists():
            return json.loads(self.ledger_path.read_text())
        return {"committed": {}, "inflight": {}}

    def write_ledger(self, ledger: dict) -> None:
        self.ledger_path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.ledger_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(ledger, indent=2))
        tmp.rename(self.ledger_path)

    # -- staged appends ----------------------------------------------------
    # All physical mutations of live artifact dirs go through these two
    # helpers so the Iceberg swap-in (append()/overwritePartitions()) is a
    # one-file change: operator code never touches the filesystem directly.

    def staging_dir(self, name: str) -> str:
        return str(self.dir / "_staging" / name)

    def unpublish(self, target: str, prefix: str) -> None:
        """Remove previously-published data files carrying ``prefix`` (a
        failed earlier attempt of the same batch) from ``target``."""
        root = Path(target)
        if not root.exists():
            return
        for p in root.rglob(f"{prefix}*"):
            if p.is_file():
                p.unlink()

    def publish(self, staging: str, target: str, prefix: str) -> None:
        """Move the data files of a staged write into the live artifact dir
        under collision-proof ``prefix``-ed names, preserving any partition
        subdirectory layout (e.g. ``tbucket=N/``). Idempotent per prefix when
        preceded by ``unpublish``."""
        src = Path(staging)
        dst = Path(target)
        for p in sorted(src.rglob("*")):
            if not p.is_file() or p.name.startswith(("_", ".")):
                continue  # skip _SUCCESS / hidden markers
            rel = p.relative_to(src)
            out = dst / rel.parent / f"{prefix}{p.name}"
            out.parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(p), str(out))
        shutil.rmtree(staging, ignore_errors=True)

    def replace_dir(self, tmp: str, target: str) -> None:
        """Swap a rewritten artifact dir into place (compaction / popularity
        writeback). Iceberg equivalent: overwritePartitions / RewriteFiles."""
        if Path(target).exists():
            shutil.rmtree(target)
        shutil.move(tmp, target)

    def remove_dir(self, target: str) -> None:
        shutil.rmtree(target, ignore_errors=True)
