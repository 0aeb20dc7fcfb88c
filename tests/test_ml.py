"""ML-over-the-index streams (operators/ml.py): FeaturesSelection /
IGain vs an independent pandas twin, and the TextLogitStream training
protocol invariants."""

import numpy as np
import pytest

pytestmark = pytest.mark.spark


def test_features_selection_matches_twin(spark, index_dir, corpus_pdf,
                                         oracle):
    """IGain top terms == an independent numpy twin computed from the
    oracle's postings and the corpus roles
    (IGainTermsQParserPlugin.java:160-211 math, natural-log entropy
    with H(0)=H(1)=0; FeaturesSelectionStream idf_d =
    ln(numDocs/(docFreq+1)))."""
    from lucene_solr_spark.operators.ml import features_selection

    got = features_selection(
        spark, index_dir, outcome_col="role",
        positive_value="assistant", num_terms=10,
    ).toPandas()

    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(
        drop=True
    )
    labels = (pdf["role"] == "assistant").to_numpy().astype(np.int64)
    n = float(labels.size)
    npos = float(labels.sum())

    def h(p):
        if p <= 0.0 or p >= 1.0:
            return 0.0
        return -p * np.log(p) - (1.0 - p) * np.log(1.0 - p)

    rows = []
    for t, (docs, _tfs) in oracle.postings.items():
        df = float(docs.size)
        xc = float(labels[docs].sum())
        score = h(npos / n) - (
            (df / n) * h(xc / df)
            + (1.0 - df / n) * h((npos - xc) / (n - df + 1.0))
        )
        rows.append((t, score, np.log(n / (df + 1.0))))
    rows.sort(key=lambda r: (-r[1], r[0]))
    want = rows[:10]
    assert got["term_s"].tolist() == [r[0] for r in want]
    assert np.allclose(got["score_f"], [r[1] for r in want], rtol=1e-12)
    assert np.allclose(got["idf_d"], [r[2] for r in want], rtol=1e-12)
    assert got["index_i"].tolist() == list(range(1, 11))


def test_text_logit_protocol(spark, index_dir):
    """TextLogitStream invariants: per-iteration confusion counts
    partition the corpus, |error| decreases across iterations on this
    separable-ish outcome, and the whole run is deterministic (fixed
    partitioning + doc_id-ordered SGD — our documented determinism
    deviation from the reference's HashMap doc order)."""
    from lucene_solr_spark.operators.ml import (
        features_selection, text_logit,
    )

    sel = features_selection(spark, index_dir, num_terms=5).collect()
    terms = [r["term_s"] for r in sel]
    idfs = [r["idf_d"] for r in sel]
    a = text_logit(spark, index_dir, terms, idfs,
                   max_iterations=4).collect()
    b = text_logit(spark, index_dir, terms, idfs,
                   max_iterations=4).collect()
    assert [r.asDict(True) for r in a] == [r.asDict(True) for r in b]
    errs = [r["error_d"] for r in a]
    assert errs[-1] < errs[0]
    import os

    import pyarrow.dataset as pads

    n_docs = pads.dataset(
        os.path.join(index_dir, "docmap"), format="parquet",
        partitioning="hive",
    ).count_rows()
    for r in a:
        total = (r["trueNegative_i"] + r["truePositive_i"]
                 + r["falseNegative_i"] + r["falsePositive_i"])
        assert total == n_docs
        assert len(r["weights"]) == len(terms) + 1
