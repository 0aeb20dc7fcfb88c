"""Index build vs oracle: stats, norms, postings (CheckIndex-style)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.spark


def test_field_stats_match_oracle(index_dir, oracle):
    from lucene_solr_spark.index.builder import read_field_stats

    fs = read_field_stats(index_dir)
    assert fs["doc_count"] == oracle.doc_count
    assert fs["sum_total_term_freq"] == oracle.sum_total_term_freq
    assert fs["max_doc"] == len(oracle.doc_ids)


def test_term_stats_match_oracle(index_dir, oracle):
    ts = pq.read_table(os.path.join(index_dir, "term_stats")).to_pandas()
    ts = ts[ts["field"] == "text"]
    got = dict(zip(ts["term"], zip(ts["doc_freq"], ts["total_term_freq"])))
    want = {
        t: (len(d), int(f.sum())) for t, (d, f) in oracle.postings.items()
    }
    assert got == want


def test_norms_match_oracle(index_dir, oracle):
    dn = (
        pq.read_table(os.path.join(index_dir, "docmap"),
                      columns=["doc_id", "norm_byte"])
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
    rows = [r for r in ds.to_table().to_pylist() if r["field"] == "text"]
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


def test_salted_hot_terms_roundtrip(spark, tmp_path, oracle):
    """Hot-term salting (skew path): with a tiny threshold every frequent
    term is split into doc-range salts; decoded salt-order concatenation
    must equal the unsalted posting list, and queries stay rank-identical."""
    import pyarrow.dataset as pads

    from lucene_solr_spark.index.builder import BuildConfig, build_index
    from lucene_solr_spark.index.codec import decode_block
    from lucene_solr_spark.query.engine import LocalSearcher
    from lucene_solr_spark.sources import gen_transcripts_df

    d = str(tmp_path / "salted")
    df = gen_transcripts_df(spark, n_convs=40, seed=42)
    build_index(
        spark, df, d,
        BuildConfig(n_buckets=4, salt_df_threshold=50, salt_target=60),
    )
    ds = pads.dataset(os.path.join(d, "postings"), partitioning="hive")
    rows = [r for r in ds.to_table().to_pylist() if r["field"] == "text"]
    assert max(r["salt"] for r in rows) > 0  # salting actually happened
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    assert set(by_term) == set(oracle.postings)
    for t, blks in by_term.items():
        blks.sort(key=lambda r: (r["salt"], r["block_id"]))
        docs = np.concatenate([decode_block(b)[0] for b in blks])
        assert np.array_equal(docs, oracle.postings[t][0]), t
        assert np.all(np.diff(docs) > 0), t  # globally sorted across salts
    s = LocalSearcher(d)
    node = ("and", [("term", "retry"), ("term", "deploy")])
    hits = s.search(node, 10)
    want = oracle.search(node, 10)
    assert [(h[0], np.float32(h[1])) for h in hits] == [
        (int(d_), np.float32(s_)) for d_, s_ in want
    ]


def test_skewed_corpus_rank_identity(spark, tmp_path):
    """SURVEY.md §7 hard-part 5: the skewed corpus variant (5 hot terms
    in >30% of turns) with salting enabled must stay rank-identical to
    the oracle on hot-term queries."""
    from lucene_solr_spark.index.builder import BuildConfig, build_index
    from lucene_solr_spark.oracle import LuceneOracle
    from lucene_solr_spark.query.engine import LocalSearcher
    from lucene_solr_spark.sources import gen_transcripts_df
    from lucene_solr_spark.sources.transcripts import (
        HOT_TERMS, gen_transcripts_pdf,
    )

    d = str(tmp_path / "skewed")
    df = gen_transcripts_df(spark, n_convs=40, seed=42, skew=True)
    build_index(
        spark, df, d,
        BuildConfig(n_buckets=4, salt_df_threshold=100, salt_target=120),
    )
    pdf = (
        gen_transcripts_pdf(40, seed=42, skew=True)
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    oracle = LuceneOracle().build(
        list(zip(range(len(pdf)), pdf["text"].tolist()))
    )
    # hot terms really are hot (exercises salting), and salted
    hot_df = len(oracle.postings[HOT_TERMS[0]][0])
    assert hot_df > 100
    s = LocalSearcher(d)
    queries = [
        ("term", HOT_TERMS[0]),
        ("or", [("term", HOT_TERMS[0]), ("term", HOT_TERMS[1])]),
        ("and", [("term", HOT_TERMS[0]), ("term", "retry")]),
    ]
    for node in queries:
        got = s.search(node, 10)
        want = oracle.search(node, 10)
        assert [(x, np.float32(y)) for x, y in got] == [
            (x, np.float32(y)) for x, y in want
        ], node
