"""Index build vs oracle: stats, norms, postings (CheckIndex-style)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.spark


def test_field_stats_match_oracle(index_dir, oracle):
    fs = pq.read_table(os.path.join(index_dir, "field_stats")).to_pylist()[0]
    assert fs["doc_count"] == oracle.doc_count
    assert fs["sum_total_term_freq"] == oracle.sum_total_term_freq
    assert fs["max_doc"] == len(oracle.doc_ids)


def test_term_stats_match_oracle(index_dir, oracle):
    ts = pq.read_table(os.path.join(index_dir, "term_stats")).to_pandas()
    got = dict(zip(ts["term"], zip(ts["doc_freq"], ts["total_term_freq"])))
    want = {
        t: (len(d), int(f.sum())) for t, (d, f) in oracle.postings.items()
    }
    assert got == want


def test_norms_match_oracle(index_dir, oracle):
    dn = (
        pq.read_table(os.path.join(index_dir, "doc_norms"))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert np.array_equal(
        dn["norm_byte"].values.astype(np.uint8), oracle.norm_bytes
    )


def test_postings_decode_match_oracle(index_dir, oracle):
    import pyarrow.dataset as pads

    from lucene_solr_spark.index.codec import decode_block

    ds = pads.dataset(os.path.join(index_dir, "postings"), partitioning="hive")
    rows = ds.to_table().to_pylist()
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    assert set(by_term) == set(oracle.postings)
    for t, blks in by_term.items():
        blks.sort(key=lambda r: (r["salt"], r["block_id"]))
        docs = np.concatenate([decode_block(b)[0] for b in blks])
        tfs = np.concatenate([decode_block(b)[1] for b in blks])
        odocs, otfs = oracle.postings[t]
        assert np.array_equal(docs, odocs), t
        assert np.array_equal(tfs, otfs), t
        # norms payload matches doc_norms
        norms = np.concatenate(
            [np.frombuffer(b["norms_payload"], dtype=np.uint8) for b in blks]
        )
        assert np.array_equal(norms, oracle.norm_bytes[odocs]), t


def test_validate_index(spark, index_dir):
    from lucene_solr_spark.index.builder import validate_index
    from lucene_solr_spark.sources import gen_transcripts_df

    src = gen_transcripts_df(spark, n_convs=40, seed=42)
    rep = validate_index(spark, src, index_dir)
    assert rep["ok"], rep


def test_lineage_rows_exist(index_dir):
    lin = pq.read_table(os.path.join(index_dir, "lineage")).to_pandas()
    assert len(lin) >= 1
    assert (lin["status"] == "committed").all()
    assert (lin["bytes"] > 0).all()
