import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from lucene_solr_spark.session import get_spark

    s = get_spark(cores=8, shuffle_partitions=8, driver_mem="8g")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_corpus():
    """200-doc deterministic corpus (FIXTURES.md 'tiny')."""
    from lucene_solr_spark.corpus import synth_corpus_local

    return synth_corpus_local(200)


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_corpus, tmp_path_factory):
    """Build the tiny index once per test session; returns (index_dir, metrics)."""
    from lucene_solr_spark.index import build_index

    index_dir = str(tmp_path_factory.mktemp("idx") / "tiny")
    docs = spark.createDataFrame(tiny_corpus)
    metrics = build_index(spark, docs, index_dir, num_segments=4, analyzer="code")
    return index_dir, metrics


@pytest.fixture(scope="session")
def tiny_oracle(tiny_corpus):
    from lucene_solr_spark.oracle import OracleIndex

    return OracleIndex(tiny_corpus, num_segments=4, analyzer="code")
