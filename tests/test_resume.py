"""Checkpoint-resume equivalence (FIXTURES.md §5, north_rule): a build
interrupted after >=1 committed stage, then re-run, must produce an index
identical to an uninterrupted build."""

import os

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from lucene_solr_spark.index import store
from lucene_solr_spark.index.builder import BuildConfig, build_index
from lucene_solr_spark.sources import gen_transcripts_df

pytestmark = pytest.mark.spark


class _Boom(RuntimeError):
    pass


def _postings_fingerprint(index_dir):
    ds = pads.dataset(os.path.join(index_dir, "postings"), partitioning="hive")
    t = (
        ds.to_table(columns=["term", "salt", "block_id", "first_doc",
                             "last_doc", "doc_count", "max_tf"])
        .to_pandas()
        .sort_values(["term", "salt", "block_id"])
        .reset_index(drop=True)
    )
    return t


def test_resume_after_partial_build(spark, tmp_path, monkeypatch):
    cfg = BuildConfig(n_buckets=4)
    df = gen_transcripts_df(spark, n_convs=15, seed=7)

    full_dir = str(tmp_path / "full")
    build_index(spark, df, full_dir, cfg)

    # interrupted build: kill right after the docmap stage commits
    part_dir = str(tmp_path / "partial")
    from lucene_solr_spark.index import builder as B

    orig = B._stage_postings

    def boom(*a, **kw):
        raise _Boom("simulated executor loss mid-build")

    monkeypatch.setattr(B, "_stage_postings", boom)
    with pytest.raises(_Boom):
        build_index(spark, df, part_dir, cfg)
    assert store.stage_committed(part_dir, "docmap")
    assert store.stage_committed(part_dir, "field_stats")
    assert not store.stage_committed(part_dir, "postings")
    assert not store.stage_committed(part_dir, "term_stats")

    # resume: completes remaining stages without redoing docmap
    monkeypatch.setattr(B, "_stage_postings", orig)
    docmap_mtime = max(
        os.path.getmtime(os.path.join(part_dir, "docmap", f))
        for f in os.listdir(os.path.join(part_dir, "docmap"))
    )
    build_index(spark, df, part_dir, cfg)
    docmap_mtime2 = max(
        os.path.getmtime(os.path.join(part_dir, "docmap", f))
        for f in os.listdir(os.path.join(part_dir, "docmap"))
    )
    assert docmap_mtime2 == docmap_mtime  # stage skipped, not rebuilt

    # identical index content
    a = _postings_fingerprint(full_dir)
    b = _postings_fingerprint(part_dir)
    assert a.equals(b)
    cols = ["doc_id", "norm_byte"]
    na = pq.read_table(os.path.join(full_dir, "docmap"), columns=cols).to_pandas().sort_values("doc_id")
    nb = pq.read_table(os.path.join(part_dir, "docmap"), columns=cols).to_pandas().sort_values("doc_id")
    assert np.array_equal(na["norm_byte"].values, nb["norm_byte"].values)

    # identical query results
    from lucene_solr_spark.query.engine import LocalSearcher

    s1 = LocalSearcher(full_dir)
    s2 = LocalSearcher(part_dir)
    for q in ["bakeka OR dupa", "retry AND deploy", "cache"]:
        assert s1.search(q, 10) == s2.search(q, 10)
