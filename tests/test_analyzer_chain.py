"""Analyzer extension point (analysis/analyzer.py AnalyzerOptions +
analysis/stem.py): Porter / EnglishMinimal stemmers vs the reference's
published vectors, folding, synonym insertion semantics, and an
end-to-end Porter-stemmed index rank-identical to the oracle built
with the same chain."""

import numpy as np
import pytest

from lucene_solr_spark.analysis.analyzer import (
    AnalyzerOptions, analyze_detailed, analyze_detailed_with, ascii_fold,
)
from lucene_solr_spark.analysis.stem import (
    english_minimal_stem, porter_stem,
)

pytestmark = pytest.mark.spark


def test_porter_reference_vectors():
    """Porter's own examples (PorterStemmer.java step comments + the
    paper's vocabulary)."""
    vec = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "digitizer": "digit", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "formaliti": "formal", "sensitiviti": "sensit",
        "sensibiliti": "sensibl", "triplicate": "triplic",
        "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr",
        "hopeful": "hope", "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun",
        "activate": "activ", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
        "queries": "queri", "query": "queri", "logi": "logi",
        "a": "a", "at": "at",  # k <= k0+1 short-word gate
    }
    for w, want in vec.items():
        assert porter_stem(w) == want, w


def test_minimal_stem_reference_rules():
    """EnglishMinimalStemmer.java:27-45 branch-by-branch."""
    vec = {
        "cats": "cat", "bus": "bus", "miss": "miss", "ties": "ty",
        "dies": "dy", "woes": "woes", "tables": "table",
        "queries": "query", "days": "day", "axes": "axe",
        "oes": "oes", "is": "is", "as": "as", "types": "type",
    }
    for w, want in vec.items():
        assert english_minimal_stem(w) == want, w


def test_ascii_fold_and_chain_semantics():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("naïve") == "naive"
    assert ascii_fold("plain") == "plain"
    opts = AnalyzerOptions.make(synonyms={"batch": ["job"]},
                                stem="porter", ascii_fold=True)
    # synonym emitted at the SAME position (posIncrement 0), both
    # stemmed; dropped stopword still gaps positions
    terms, poss = analyze_detailed_with("the Batch of caresses", opts)
    assert terms == ["batch", "job", "caress"]
    assert poss == [1, 1, 3]
    # default options are bit-identical to the plain chain
    d = AnalyzerOptions()
    assert d.is_default()
    txt = "the Quick batches of 42 caresses"
    assert analyze_detailed_with(txt, d) == analyze_detailed(txt)
    # manifest round-trip preserves the chain
    rt = AnalyzerOptions.from_manifest(opts.to_manifest())
    assert rt == opts


def test_porter_index_rank_identity(spark, tmp_path):
    """End-to-end: a Porter-stemmed index answers queries
    rank-identically to the numpy oracle built with the same chain,
    and plural/inflected query forms hit the stemmed postings
    (PorterStemFilter.java:56 behavior at both index and query time)."""
    from lucene_solr_spark.index.builder import BuildConfig, build_index
    from lucene_solr_spark.oracle import LuceneOracle
    from lucene_solr_spark.query.distributed import DistributedSearcher
    from lucene_solr_spark.query.engine import LocalSearcher
    from lucene_solr_spark.query.parser import parse_query
    from lucene_solr_spark.sources import (
        gen_transcripts_df, gen_transcripts_pdf,
    )

    opts = AnalyzerOptions.make(stem="porter")
    d = str(tmp_path / "stemidx")
    build_index(spark, gen_transcripts_df(spark, n_convs=20, seed=9), d,
                BuildConfig(n_buckets=2, positions=True, stem="porter"))
    pdf = (gen_transcripts_pdf(20, seed=9)
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    oracle = LuceneOracle().build(
        list(zip(range(len(pdf)), pdf["text"].tolist())),
        keyword_values={"role": pdf["role"].tolist(),
                        "tool": pdf["tool"].tolist()},
        ts_values=pdf["ts"].tolist(),
        analyzer_opts=opts,
    )
    ls = LocalSearcher(d)
    ds = DistributedSearcher(spark, d)
    assert ls.analyzer_opts == opts  # manifest round-trip
    for q in ("caches", "cache", "deploys AND retries",
              '"deploy retry"~2', "batch OR queries"):
        node = parse_query(q, opts=opts)
        want = oracle.search(node, 10) if node is not None else []
        got_l = ls.search(q, 10)
        got_d = ds.search(q, 10)
        for name, got in (("local", got_l), ("dist", got_d)):
            assert len(got) == len(want), (name, q)
            for (gd, gs), (wd, ws) in zip(got, want):
                assert gd == wd and np.float32(gs) == np.float32(ws), (
                    name, q)
    # inflected query form reaches the stemmed posting list
    assert ls.search("caches", 10) == ls.search("cache", 10)
    assert len(ls.search("caches", 10)) > 0


def test_chain_survives_append_and_compaction(spark, tmp_path):
    """The analyzer chain is an INDEX property: NRT appends re-create
    it from the manifest even when the caller passes no config, and
    compaction carries it into the compacted manifest (otherwise every
    query against the compacted index would silently de-stem)."""
    import pandas as pd

    from lucene_solr_spark.analysis.analyzer import AnalyzerOptions
    from lucene_solr_spark.index.builder import (
        BuildConfig, append_segment, build_index, compact_index,
    )
    from lucene_solr_spark.index import store
    from lucene_solr_spark.query.engine import LocalSearcher
    from lucene_solr_spark.sources import gen_transcripts_df

    opts = AnalyzerOptions.make(stem="porter")
    d = str(tmp_path / "base")
    build_index(spark, gen_transcripts_df(spark, n_convs=8, seed=3), d,
                BuildConfig(n_buckets=2, stem="porter"))
    batch = spark.createDataFrame(
        pd.DataFrame({
            "conv_id": ["zzz"], "turn_idx": [0],
            "role": ["user"], "tool": [None],
            "text": ["caching deployments repeatedly"],
            "ts": [pd.Timestamp("2026-01-01")],
        })
    )
    append_segment(spark, batch, d)  # NO cfg: chain must come from manifest
    s = LocalSearcher(d)
    assert s.analyzer_opts == opts
    hits = s.search("cached deployment", 5)  # both stem to indexed forms
    new_doc = max(x for x, _ in s.search("deployment", 100))
    assert new_doc in [x for x, _ in hits]
    out = str(tmp_path / "compacted")
    compact_index(spark, d, out)
    assert AnalyzerOptions.from_manifest(
        store.get_params(out).get("analyzer")) == opts
    s2 = LocalSearcher(out)
    assert s2.search("cached deployment", 5) == hits
