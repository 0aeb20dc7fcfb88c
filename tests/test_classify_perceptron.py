"""BooleanPerceptronClassifier (operators/classify.py perceptron_*):
training fold + classification vs an independent pure-python replay of
BooleanPerceptronClassifier.java:110-221, including the batchSize
stale-snapshot discipline."""

import numpy as np
import pytest

pytestmark = pytest.mark.spark


def _replay(oracle, corpus_pdf, batch_size=1):
    """Pure-python reference replay from the oracle's postings."""
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(
        drop=True
    )
    labels = (pdf["role"] == "assistant").tolist()
    weights = {t: int(tfs.sum()) for t, (_d, tfs) in oracle.postings.items()}
    threshold = sum(d.size for d, _ in oracle.postings.values()) / 2.0
    tv = {}
    for t, (docs, tfs) in oracle.postings.items():
        for d, tf in zip(docs, tfs):
            tv.setdefault(int(d), []).append((t, int(tf)))
    snapshot = dict(weights)
    batch_count = 0
    for doc_id in range(len(labels)):
        terms = tv.get(doc_id, [])
        output = sum(tf * snapshot.get(t, 0) for t, tf in terms)
        assigned = output >= threshold
        modifier = int(labels[doc_id]) - int(assigned)
        if modifier != 0:
            for t, tf in terms:
                prev = snapshot.get(t)
                weights[t] = 0 if prev is None else prev + modifier * tf
            if batch_count % batch_size == 0:
                snapshot = dict(weights)
        batch_count += 1
    return weights, threshold


def test_perceptron_train_matches_replay(spark, index_dir, corpus_pdf,
                                         oracle):
    from lucene_solr_spark.operators.classify import perceptron_train

    for bs in (1, 7):
        wdf, th = perceptron_train(spark, index_dir, batch_size=bs)
        got = {r["term"]: r["weight"] for r in wdf.collect()}
        want, want_th = _replay(oracle, corpus_pdf, batch_size=bs)
        assert th == want_th
        assert got == want, f"batch_size={bs}"


def test_perceptron_classify(spark, index_dir, corpus_pdf, oracle):
    from lucene_solr_spark.operators.classify import (
        perceptron_classify_df, perceptron_train,
    )

    wdf, th = perceptron_train(spark, index_dir)
    got = {
        r["doc_id"]: (r["assigned"], r["score"])
        for r in perceptron_classify_df(spark, index_dir, wdf, th).collect()
    }
    weights, _ = _replay(oracle, corpus_pdf)
    outputs = {}
    for t, (docs, tfs) in oracle.postings.items():
        for d, tf in zip(docs, tfs):
            outputs[int(d)] = outputs.get(int(d), 0) + int(tf) * weights[t]
    # every STORED doc classifies (empty-after-analysis docs score the
    # all-zero output, like assignClass on a stopword-only text)
    assert len(got) == len(corpus_pdf)
    both = [False, False]
    for d, (assigned, score) in got.items():
        o = float(outputs.get(d, 0))
        assert assigned == (o >= th)
        # JVM Math.exp and numpy exp may differ in the last ulp;
        # after the 1-exp cancellation that is an ABSOLUTE error
        # bounded by one ulp of exp (~2.3e-16)
        assert np.isclose(score, 1.0 - np.exp(-abs(th - o) / th),
                          rtol=1e-12, atol=1e-14)
        both[int(assigned)] = True
    assert all(both), "classifier should separate the corpus both ways"
