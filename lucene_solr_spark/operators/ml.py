"""ML-over-the-index streams: feature selection + text logistic
regression (the reference's streaming-ML pair).

- ``features_selection`` — FeaturesSelectionStream
  (solrj/.../io/stream/FeaturesSelectionStream.java:330-375 merge +
  idf_d = ln(numDocs/(docFreq+1))) backed by the IGain collector
  (solr/core/.../search/IGainTermsQParserPlugin.java:160-211): for
  every term of the field, with xc = positive docs containing it and
  docFreq = labeled docs containing it,
      score = H(p) - (docFreq/numDocs * H(xc/docFreq)
                      + (1 - docFreq/numDocs)
                        * H((numPositive-xc)/(numDocs-docFreq+1)))
  where H is the natural-log binary entropy with H(0)=H(1)=0
  (:208-211), p = numPositive/numDocs; top numTerms by score.

- ``text_logit`` — TextLogitStream
  (solrj/.../io/stream/TextLogitStream.java:442-499 iterate +
  averageWeights) backed by the per-shard sequential SGD collector
  (solr/core/.../search/TextLogisticRegressionQParserPlugin.java:
  176-228): doc vector = [1, idf_i * (1 + ln(tf_i)) ...] over the
  selected feature terms, per-doc update w -= alpha*(sigmoid(w.v) -
  y)*v, shards train from the same incoming weights each iteration
  and the driver AVERAGES the shard weights.

Spark-first shapes:
- features_selection: one full-field postings decode (Arrow-batched
  mapInPandas over the bucket-partitioned parquet — the same scan
  shape as a segment merge), ONE shuffle to join doc labels, ONE
  groupBy(term) aggregation computing xc/docFreq, then the entropy
  arithmetic as JVM-side expressions and a TakeOrderedAndProject for
  the top-k.  numDocs/numPositive are two scalars from a docmap
  aggregate.  At 100 TB this is the cost of one postings⨝docmap
  sort-merge join — no per-term queries, no driver loops.
- text_logit: the feature-term postings load through the PRUNED scan
  (only the selected terms' buckets), pivot to per-doc dense vectors
  (k features — tens, not the dictionary), and each iteration is one
  applyInPandas over a fixed partitioning: partitions ARE the
  reference's shards (sequential per-doc SGD inside, doc_id order),
  weights averaged on the driver between iterations, exactly the
  TextLogitStream protocol.  Deviation (documented): the reference
  iterates docs in HashMap order (JVM-nondeterministic); we use
  doc_id ASC so runs are reproducible.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _decoded_docs_df(spark: SparkSession, index_dir: str,
                     field: str = "text",
                     terms: list[str] | None = None) -> DataFrame:
    """DF(term, doc_id, tf) decoded from the postings parquet — full
    field scan when `terms` is None (the IGain collector's
    MultiFields.getFields(...).terms(field) walk), bucket-pruned +
    term-pushed otherwise."""
    from ..index.builder import term_bucket
    from ..index.codec import decode_block

    post = spark.read.parquet(os.path.join(index_dir, "postings"))
    post = post.filter(F.col("field") == field)
    if terms is not None:
        import json

        with open(os.path.join(index_dir, "_manifest.json")) as f:
            nb = int(json.load(f)["params"]["n_buckets"])
        buckets = sorted({term_bucket(t, nb) for t in terms})
        post = post.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
    post = post.select("term", "kind", "first_doc", "block_id",
                       "doc_count", "payload")

    def dec(batches):
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                docs, tfs = decode_block(
                    dict(kind=row.kind, payload=row.payload,
                         doc_count=row.doc_count, first_doc=row.first_doc,
                         block_id=row.block_id)
                )
                outs.append(pd.DataFrame(
                    {"term": row.term, "doc_id": docs,
                     "tf": tfs.astype("int32")}
                ))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return post.mapInPandas(dec, "term string, doc_id long, tf int")


def _labels_df(spark: SparkSession, index_dir: str, outcome_col: str,
               positive_value) -> DataFrame:
    """DF(doc_id, label int 0/1) from the docmap stored fields — the
    collector's NumericDocValues outcome read (IGainTermsQParserPlugin
    :134-146, positive iff value == positiveLabel)."""
    dm = spark.read.parquet(os.path.join(index_dir, "docmap"))
    return dm.select(
        "doc_id",
        F.when(F.col(outcome_col) == F.lit(positive_value), 1)
        .otherwise(0).alias("label"),
    )


def _entropy(p):
    """Natural-log binary entropy as a Spark Column, H(0)=H(1)=0
    (IGainTermsQParserPlugin.binaryEntropy:208-211)."""
    return F.when((p <= 0.0) | (p >= 1.0), F.lit(0.0)).otherwise(
        -p * F.log(p) - (F.lit(1.0) - p) * F.log(F.lit(1.0) - p)
    )


def features_selection(spark: SparkSession, index_dir: str,
                       outcome_col: str = "role",
                       positive_value="assistant",
                       num_terms: int = 10,
                       field: str = "text") -> DataFrame:
    """Top-`num_terms` feature terms by information gain against a
    binary outcome, with the stream's output columns: (index_i,
    term_s, score_f, idf_d).  All-double arithmetic so a SQL twin is
    bit-stable; order score DESC, term ASC (sortByValue merge order
    made deterministic)."""
    labels = _labels_df(spark, index_dir, outcome_col, positive_value)
    tot = labels.agg(
        F.count("*").alias("n"), F.sum("label").alias("npos")
    ).collect()[0]
    n_docs, n_pos = float(tot["n"]), float(tot["npos"])
    per_term = (
        _decoded_docs_df(spark, index_dir, field)
        .join(labels, "doc_id")
        .groupBy("term")
        .agg(F.count("*").alias("doc_freq"),
             F.sum("label").alias("xc"))
    )
    df_d = F.col("doc_freq").cast("double")
    xc_d = F.col("xc").cast("double")
    h_c = _entropy(F.lit(n_pos / n_docs))
    h_in = _entropy(xc_d / df_d)
    h_out = _entropy((F.lit(n_pos) - xc_d)
                     / (F.lit(n_docs) - df_d + F.lit(1.0)))
    score = h_c - (df_d / F.lit(n_docs) * h_in
                   + (F.lit(1.0) - df_d / F.lit(n_docs)) * h_out)
    top = (
        per_term.withColumn("score_f", score)
        .withColumn("idf_d", F.log(F.lit(n_docs) / (df_d + F.lit(1.0))))
        .orderBy(F.desc("score_f"), F.asc("term"))
        .limit(num_terms)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score_f"), F.asc("term"))
    return top.select(
        F.row_number().over(w).alias("index_i"),
        F.col("term").alias("term_s"), "score_f", "idf_d",
    )


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def text_logit(spark: SparkSession, index_dir: str, terms: list[str],
               idfs: list[float], outcome_col: str = "role",
               positive_value="assistant", max_iterations: int = 10,
               alpha: float = 0.01, threshold: float = 0.5,
               n_shards: int = 4, field: str = "text") -> DataFrame:
    """Train logistic regression over the selected feature terms with
    the TextLogitStream protocol: each iteration every shard
    (partition) runs sequential per-doc SGD from the SAME incoming
    weights (doc vector [1, idf_i*(1+ln tf_i)], update w -= alpha *
    (sigmoid(w.v) - y) * v — TextLogisticRegressionQParserPlugin.java:
    200-216), and the new global weights are the shard AVERAGE
    (TextLogitStream.averageWeights:499-510).  Returns one row per
    iteration: (iteration_i, error_d, trueNegative_i, truePositive_i,
    falseNegative_i, falsePositive_i, weights array<double>) — the
    stream's per-iteration tuple.  Error/confusion are evaluated with
    the INCOMING weights (the collector scores lastSig before
    updating, :208-210)."""
    k = len(terms)
    assert len(idfs) == k
    labels = _labels_df(spark, index_dir, outcome_col, positive_value)
    tfd = _decoded_docs_df(spark, index_dir, field, terms=terms)
    # pivot to per-doc dense feature vectors: k is tens of features,
    # so the pivot is a cheap conditional-agg projection
    tidx = {t: i for i, t in enumerate(terms)}
    b_t = spark.sparkContext.broadcast(tidx)
    b_idf = spark.sparkContext.broadcast([float(x) for x in idfs])

    def vecs(batches):
        for pdf in batches:
            ti = pdf["term"].map(b_t.value).to_numpy()
            w = np.asarray(b_idf.value)[ti] * (
                1.0 + np.log(pdf["tf"].to_numpy().astype(np.float64))
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "fidx": ti.astype("int32"), "fval": w})

    fv = tfd.mapInPandas(vecs, "doc_id long, fidx int, fval double")
    # INNER join from labels: only docs that appear in a selected
    # feature term's postings get a docVector and train — the
    # reference populates docVectors from the feature terms' postings
    # walk, so label-only docs never enter the SGD
    # (TextLogisticRegressionQParserPlugin.java finish() loop :176-196)
    rows = (
        labels.join(
            fv.groupBy("doc_id")
            .agg(F.collect_list(F.struct("fidx", "fval")).alias("feats")),
            "doc_id",
        )
        .repartitionByRange(n_shards, "doc_id")
    )
    rows.persist()
    try:
        n_feat = k + 1
        weights = np.ones(n_feat, dtype=np.float64)
        out_rows = []
        schema = ("shard int, error double, tn long, tp long, fn long, "
                  "fp long") + "".join(f", w{i} double"
                                       for i in range(n_feat))
        for it in range(1, max_iterations + 1):
            b_w = spark.sparkContext.broadcast(weights.copy())

            def train(batches, _bw=b_w, _nf=n_feat, _a=alpha,
                      _th=threshold):
                parts = [pdf for pdf in batches]
                if not parts:
                    return
                pdf = pd.concat(parts, ignore_index=True)
                pdf = pdf.sort_values("doc_id")
                w0 = _bw.value.copy()
                w = w0.copy()
                err = 0.0
                tn = tp = fn = fp = 0
                for feats, y in zip(pdf["feats"], pdf["label"]):
                    v = np.zeros(_nf)
                    v[0] = 1.0
                    if feats is not None:
                        for f_ in feats:
                            v[int(f_["fidx"]) + 1] = float(f_["fval"])
                    sig = _sigmoid(float(np.add.reduce(v * w)))
                    e = sig - float(y)
                    last = _sigmoid(float(np.add.reduce(v * w0)))
                    # error accumulates |lastSig - outcome| — evaluated
                    # with the ITERATION-INCOMING weights, exactly like
                    # the confusion counts (TextLogisticRegression
                    # QParserPlugin.java finish(): totalError +=
                    # Math.abs(lastSig - outcome))
                    err += abs(last - float(y))
                    pred = 1 if last >= _th else 0
                    if y == 1:
                        tp += pred
                        fn += 1 - pred
                    else:
                        fp += pred
                        tn += 1 - pred
                    w -= _a * e * v
                yield pd.DataFrame([{
                    "shard": 0, "error": err, "tn": tn, "tp": tp,
                    "fn": fn, "fp": fp,
                    **{f"w{i}": w[i] for i in range(_nf)},
                }])

            got = rows.mapInPandas(train, schema).collect()
            ws = np.array(
                [[r[f"w{i}"] for i in range(n_feat)] for r in got]
            )
            weights = ws.mean(axis=0)
            out_rows.append({
                "iteration_i": it,
                "error_d": float(sum(r["error"] for r in got)),
                "trueNegative_i": int(sum(r["tn"] for r in got)),
                "truePositive_i": int(sum(r["tp"] for r in got)),
                "falseNegative_i": int(sum(r["fn"] for r in got)),
                "falsePositive_i": int(sum(r["fp"] for r in got)),
                "weights": [float(x) for x in weights],
            })
    finally:
        rows.unpersist()
    return spark.createDataFrame(
        pd.DataFrame(out_rows),
        "iteration_i int, error_d double, trueNegative_i int, "
        "truePositive_i int, falseNegative_i int, falsePositive_i int, "
        "weights array<double>",
    )
