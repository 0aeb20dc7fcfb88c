import os
import shutil

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from lucene_solr_spark.session import get_spark

    s = get_spark("lss-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf():
    """Smoke corpus (~900 turns), local pandas twin."""
    from lucene_solr_spark.sources import gen_transcripts_pdf

    return gen_transcripts_pdf(n_convs=40, seed=42)


@pytest.fixture(scope="session")
def oracle(corpus_pdf):
    from lucene_solr_spark.oracle import LuceneOracle

    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    rows = list(zip(range(len(pdf)), pdf["text"].tolist()))
    return LuceneOracle().build(
        rows,
        keyword_values={
            "role": pdf["role"].tolist(),
            "tool": pdf["tool"].tolist(),
        },
        ts_values=pdf["ts"].tolist(),
    )


@pytest.fixture(scope="session")
def index_dir(spark, tmp_path_factory):
    """Index built by the Spark engine over the same smoke corpus."""
    from lucene_solr_spark.index.builder import BuildConfig, build_index
    from lucene_solr_spark.sources import gen_transcripts_df

    d = str(tmp_path_factory.mktemp("index") / "smoke")
    df = gen_transcripts_df(spark, n_convs=40, seed=42)
    build_index(spark, df, d, BuildConfig(n_buckets=4, positions=True))
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def query_set(oracle):
    from lucene_solr_spark.sources.queryset import build_query_set

    dfs = {t: len(p[0]) for t, p in oracle.postings.items()}
    return build_query_set(dfs)
