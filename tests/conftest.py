from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_CONVS_UNIT = 40  # ~260 turns: FIXTURES.md §1 unit tier


@pytest.fixture(scope="session")
def spark():
    from search_engine_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf():
    from search_engine_spark.corpus import generate_pandas

    return generate_pandas(N_CONVS_UNIT, seed=42)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    return spark.createDataFrame(transcripts_pdf)


@pytest.fixture(scope="session")
def oracle_index(transcripts_pdf):
    from search_engine_spark.oracle import build_oracle_index

    return build_oracle_index(transcripts_pdf)


@pytest.fixture(scope="session")
def index_store(spark, transcripts_df, tmp_path_factory):
    from search_engine_spark.index.builder import build_index

    d = tmp_path_factory.mktemp("index")
    return build_index(
        spark, transcripts_df, str(d), drange_span=64, n_chunks=2
    )
