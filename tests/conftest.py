"""Shared fixtures: one SparkSession per test run; small deterministic
corpus/query fixtures per FIXTURES.md."""

from __future__ import annotations

import pytest

from shazam_an_industrial_strength_audio_search_algorithm__spark.session import get_spark
from shazam_an_industrial_strength_audio_search_algorithm__spark.sources.corpus import (
    make_corpus,
    make_queries,
    make_update_fixtures,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    return make_corpus(n_docs=50, seed=42, min_len=50, max_len=300)


@pytest.fixture(scope="session")
def queries_pdf(corpus_pdf):
    return make_queries(corpus_pdf, n_queries=15, seed=44)


@pytest.fixture(scope="session")
def update_fixtures(corpus_pdf):
    return make_update_fixtures(corpus_pdf, seed=43)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf)


@pytest.fixture(scope="session")
def queries_df(spark, queries_pdf):
    return spark.createDataFrame(queries_pdf[["query_id", "text"]])
