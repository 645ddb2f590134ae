"""Delete / re-index (S10 analog): tombstones exclude docs from every query
path immediately; compaction restores exact fresh-build statistics."""

import pytest

from search_engine_spark.corpus import HEAD_TERMS, VOCAB, generate_pandas
from search_engine_spark.index.builder import build_index
from search_engine_spark.index.deletes import compact, mark_deleted, tombstones
from search_engine_spark.oracle import build_oracle_index, score_query, topk
from search_engine_spark.query.pipeline import search

QUERY = f"{HEAD_TERMS[0]} {VOCAB[0]}"
PHRASE_Q = f'"{VOCAB[0]} {VOCAB[1]}"'


@pytest.fixture(scope="module")
def deleted_setup(spark, transcripts_pdf, tmp_path_factory):
    d = tmp_path_factory.mktemp("del") / "ix"
    store = build_index(
        spark, spark.createDataFrame(transcripts_pdf), str(d),
        drange_span=64, n_chunks=2,
    )
    # delete the docs that top the query before deletion
    before = search(spark, store, QUERY, k=3, with_metadata=False).collect()
    victims = [r["doc_id"] for r in before]
    mark_deleted(spark, store, victims)
    return store, victims


def test_tombstones_exclude_from_all_paths(spark, deleted_setup):
    store, victims = deleted_setup
    for engine in ("df", "wand"):
        got = search(
            spark, store, QUERY, k=10, engine=engine, with_metadata=False
        ).collect()
        assert got, engine
        assert not set(victims) & {r["doc_id"] for r in got}, engine
    ph = search(spark, store, PHRASE_Q, k=10, with_metadata=False).collect()
    assert not set(victims) & {r["doc_id"] for r in ph}


def test_df_and_wand_agree_under_tombstones(spark, deleted_setup):
    store, _ = deleted_setup
    a = search(spark, store, QUERY, k=10, engine="df", with_metadata=False).collect()
    b = search(spark, store, QUERY, k=10, engine="wand", with_metadata=False).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
        (r["doc_id"], round(r["score"], 9)) for r in b
    ]


def test_compaction_restores_fresh_build_semantics(
    spark, transcripts_pdf, deleted_setup
):
    store, victims = deleted_setup
    compact(spark, store)
    assert tombstones(spark, store) is None
    assert store.corpus_stats()["n_docs"] == len(transcripts_pdf) - len(victims)

    # oracle over the surviving corpus, with ORIGINAL doc ids: compaction
    # must not renumber survivors (stable ids = stable external references)
    oix = build_oracle_index(transcripts_pdf)
    surviving = set(range(len(transcripts_pdf))) - set(victims)
    import pandas as pd

    surv_pdf = (
        transcripts_pdf.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .loc[sorted(surviving)]
    )
    oix2 = build_oracle_index(surv_pdf)
    # oracle renumbers densely; map dense ids back to original ids
    idmap = dict(enumerate(sorted(surviving)))
    exp = [
        (idmap[d], round(s, 9))
        for d, s in topk(score_query(oix2, QUERY), 10)
    ]
    for engine in ("df", "wand"):
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in search(
                spark, store, QUERY, k=10, engine=engine, with_metadata=False
            ).collect()
        ]
        assert got == exp, engine
