"""Distributed query executor: the boolean/BM25 plan as DataFrame ops.

This is the cluster path (Solr's distributed GET_TOP_IDS phase, SURVEY.md
§3.2 step 5): every index partition scores its postings locally, then the
global top-k is a TakeOrderedAndProject merge — never a full sort
(TopDocs.merge semantics, search/TopDocs.java:90-114).

Plan shape per query:
- scan postings parquet with bucket partition pruning + term predicate
  pushdown (block payloads are only materialized for surviving rows),
- decode + score blocks in one Arrow-batched mapInPandas (float32 per-term
  scores, broadcast {term: doc_freq} + global stats),
- boolean tree:   AND -> inner join on doc_id (clause-order double sum);
                  OR  -> union + groupBy(doc_id) with clause-index-sorted
                         aggregation so the double-sum order is
                         deterministic and equals the oracle's,
- top-k: orderBy(score desc, doc_id asc).limit(k)  [per-partition heaps +
  driver merge under AQE — the TopScoreDocCollector/TopDocs.merge shape].

Scores are float32 end-to-end and rank-identical to the LocalSearcher and
the numpy oracle (dtype="float32", the serving default).  dtype="float64"
is the GATE mode: per-term scores computed in double precision from the
exact decoded tf and the exact doc length (docmap `dl`, not the quantized
norm byte) so an ANSI-SQL engine (DuckDB) reproduces them bit-stably —
the same plan shapes, a DuckDB-checkable scoring surface.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..index.builder import term_bucket
from ..index.codec import decode_block
from ..oracle.smallfloat import NORM_TABLE
from .parser import parse_query


class DistributedSearcher:
    """`similarity` mirrors LocalSearcher: "bm25" (default, k1/b from
    the index params), "classic" (TF-IDF, ClassicSimilarity.java —
    sqrt(tf) * (ln((docCount+1)/(docFreq+1))+1) * norm, where norm is
    byte315ToFloat(norm byte) in serving mode and the exact 1/sqrt(dl)
    in float64 gate mode), or "lmd" (LMDirichletSimilarity.java:66-71 —
    per-term max(0, ln(1 + tf/(mu*pc)) + ln(mu/(dl+mu))), pc the term's
    collection probability).  In serving mode lmd keeps the reference's
    float discipline (float32 pc, norm-byte-decoded docLen — rank-
    identical to LocalSearcher); in float64 gate mode the whole formula
    is double with exact dl and pc = (ttf+1)/(sttf+1), bit-stable
    against an ANSI-SQL twin (same deviation discipline as bm25).
    "lmjm" and the round-4 SimilarityBase family ("dfr", "ib", "dfi",
    "ax", "bool" — see query/similarities.py for formulas and
    citations) follow the same two-mode discipline."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 dtype: str = "float32", similarity: str = "bm25",
                 mu: float = 2000.0, lmjm_lambda: float = 0.1):
        from .similarities import SIMBASE

        assert dtype in ("float32", "float64")
        assert similarity in ("bm25", "classic", "lmd", "lmjm") + SIMBASE
        self.mu = float(mu)
        self.lmjm_lambda = float(lmjm_lambda)
        self.spark = spark
        self.index_dir = index_dir
        self.dtype = dtype
        self.similarity = similarity
        #: Spark SQL type of the score column in every plan node
        self._st = "float" if dtype == "float32" else "double"
        with open(os.path.join(index_dir, "_manifest.json")) as f:
            self.params = json.load(f)["params"]
        self.n_buckets = int(self.params["n_buckets"])
        from ..analysis.analyzer import AnalyzerOptions

        #: the index's recorded analyzer chain (query atoms analyze
        #: through the same chain as indexing)
        self.analyzer_opts = AnalyzerOptions.from_manifest(
            self.params.get("analyzer")
        )
        self.k1 = float(self.params.get("k1", 1.2))
        self.b = float(self.params.get("b", 0.75))
        from ..index.builder import read_field_stats

        fs = read_field_stats(index_dir)
        self.doc_count = int(fs["doc_count"] or 0)
        self.sum_ttf = int(fs["sum_total_term_freq"] or 0)
        self._postings_path = os.path.join(index_dir, "postings")
        self._term_stats = spark.read.parquet(os.path.join(index_dir, "term_stats"))

    # ------------------------------------------------------------ plan
    @property
    def _text_stats(self) -> DataFrame:
        return self._term_stats.filter(F.col("field") == "text")

    #: broadcast the tombstone set only while its on-disk footprint is
    #: small; a BroadcastExchange still collects the build side into the
    #: driver/executor JVMs (hard caps ~8 GB / 512M rows), so a
    #: heavily-curated corpus with billions of tombstones must take the
    #: shuffle anti-join instead.  64 MB of parquet ≈ low tens of
    #: millions of int64 doc_ids — comfortably broadcastable.
    _DELETES_BROADCAST_MAX_BYTES = 64 * 1024 * 1024

    def _live(self, plan: DataFrame) -> DataFrame:
        """Mask tombstoned docs (liveDocs at collection time): an
        anti-join against the deletes parquet read DIRECTLY as a
        DataFrame — the tombstone set never materializes as Python
        objects on the driver (VERDICT r2 item 4; Lucene50LiveDocsFormat
        keeps liveDocs as per-segment files, our analogue is the
        append-only deletes/ table).  The broadcast hint is applied only
        while the deletes footprint is under
        ``_DELETES_BROADCAST_MAX_BYTES``; beyond that the join falls
        back to a plain shuffle left_anti, which scales to billions of
        tombstones.  Scores/stats stay unchanged until compaction,
        exactly the reference's pre-merge delete semantics."""
        import glob

        dels = glob.glob(
            os.path.join(self.index_dir, "deletes", "del-*.parquet")
        )
        if not dels:
            return plan
        del_df = self.spark.read.parquet(*dels).select("doc_id").distinct()
        total_bytes = sum(os.path.getsize(p) for p in dels)
        if total_bytes <= self._DELETES_BROADCAST_MAX_BYTES:
            del_df = F.broadcast(del_df)
        return plan.join(del_df, "doc_id", "left_anti")

    def _pruned_postings(self, terms: list[str], cols: list[str],
                         field: str = "text") -> DataFrame:
        """Posting-block scan for the given terms of one field: bucket
        partition pruning + field/term predicate pushdown, column-pruned
        to `cols`."""
        buckets = sorted({term_bucket(t, self.n_buckets) for t in terms})
        return (
            self.spark.read.parquet(self._postings_path)
            .filter(
                F.col("bucket").isin(buckets)
                & (F.col("field") == field)
                & F.col("term").isin(terms)
            )
            .select(*cols)
        )

    def _decoded_tf_df(self, terms: list[str]) -> DataFrame:
        """DF(term, doc_id, tf int) decoded from posting blocks."""
        post = self._pruned_postings(
            terms, ["term", "kind", "first_doc", "block_id", "doc_count",
                    "payload"],
        )

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

    def _decoded_tf_norm_df(self, terms: list[str]) -> DataFrame:
        """DF(term, doc_id, tf int, norm int) — like _decoded_tf_df but
        carrying the norm byte (for kernels that score summed freqs)."""
        post = self._pruned_postings(
            terms, ["term", "kind", "first_doc", "block_id", "doc_count",
                    "payload", "norms_payload"],
        )

        def dec(batches):
            for pdf in batches:
                outs = []
                for row in pdf.itertuples(index=False):
                    docs, tfs = decode_block(
                        dict(kind=row.kind, payload=row.payload,
                             doc_count=row.doc_count,
                             first_doc=row.first_doc,
                             block_id=row.block_id)
                    )
                    norms = np.frombuffer(row.norms_payload, dtype=np.uint8)
                    outs.append(pd.DataFrame(
                        {"term": row.term, "doc_id": docs,
                         "tf": tfs.astype("int32"),
                         "norm": norms.astype("int32")}
                    ))
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return post.mapInPandas(
            dec, "term string, doc_id long, tf int, norm int"
        )

    def _synonym_plan(self, terms: list[str],
                      clause_idx: list[int]) -> DataFrame:
        """SynonymQuery plan (search/SynonymQuery.java): one pruned
        decode of the synonym terms, groupBy(doc_id) summing freqs
        (SynonymScorer — same doc => same norm byte, F.first is safe),
        then ONE pseudo-term scoring pass with docFreq = max over
        terms, totalTermFreq = sum (:134-147), through the shared
        freq->score kernel in both modes."""
        i = clause_idx[0]
        clause_idx[0] += 1
        terms = sorted(set(terms))
        stats = {
            r["term"]: (int(r["doc_freq"]), int(r["total_term_freq"]))
            for r in self._text_stats.filter(
                F.col("term").isin(terms)
            ).collect()
        }
        if not stats:
            return self.spark.createDataFrame(
                [], f"doc_id long, score {self._st}, cidx int"
            )
        df_max = max(s[0] for s in stats.values())
        ttf_sum = sum(s[1] for s in stats.values())
        agg = (
            self._decoded_tf_norm_df(terms)
            .groupBy("doc_id")
            .agg(F.sum("tf").alias("tf"), F.first("norm").alias("norm"))
        )
        if self.dtype == "float64":
            dl = self.spark.read.parquet(
                os.path.join(self.index_dir, "docmap")
            ).select("doc_id", "dl")
            agg = agg.join(dl, "doc_id")
        dc, k1d, bd, avgdl_d = self.doc_count, self.k1, self.b, self._avgdl
        sttf = self.sum_ttf
        dtype, st, sim = self.dtype, self._st, self.similarity
        mu, lam = self.mu, self.lmjm_lambda
        # pseudo single-clause weight: df = max, ttf = sum
        wv, cache, idf_sum_d, lmd_w = self._freq_weights(
            {"__syn__": (df_max, ttf_sum)}, ["__syn__"]
        )

        def score_syn(batches):
            for pdf in batches:
                freqs = pdf["tf"].to_numpy().astype(
                    np.float32 if dtype == "float32" else np.float64
                )
                sc = _score_freq_batch(
                    freqs, pdf, sim, dtype, wv, cache, idf_sum_d,
                    k1d, bd, avgdl_d, lmd_w, mu, lam, dc, sttf,
                )
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"].to_numpy(), "score": sc}
                )

        return (
            agg.mapInPandas(score_syn, f"doc_id long, score {st}")
            .withColumn("cidx", F.lit(i))
        )

    @property
    def _avgdl(self) -> float:
        return (
            self.sum_ttf / float(self.doc_count)
            if self.sum_ttf > 0 and self.doc_count > 0 else 1.0
        )

    def _scored_terms_df_double(self, terms: list[str]) -> DataFrame:
        """Gate-mode per-term scores: double-precision scoring from
        exact tf/df/dl (docmap doc length, not the quantized norm byte)
        — bit-stable against an ANSI-SQL twin; formula per
        self.similarity."""
        tp = self._decoded_tf_df(terms)
        ts = (
            self._text_stats.filter(F.col("term").isin(terms))
            .select("term", "doc_freq", "total_term_freq")
        )
        dl = self.spark.read.parquet(
            os.path.join(self.index_dir, "docmap")
        ).select("doc_id", "dl")
        dc, avgdl, k1, b = self.doc_count, self._avgdl, self.k1, self.b
        if self.similarity == "lmd":
            # all-double lmd with exact dl and pc = (ttf+1)/(sttf+1):
            # LN(1+x) (not log1p) so an ANSI-SQL twin is bit-stable
            mu, sttf = self.mu, self.sum_ttf
            pc = (F.col("total_term_freq") + F.lit(1.0)) / F.lit(
                sttf + 1.0
            )
            score = F.greatest(
                F.lit(0.0),
                F.log(F.lit(1.0)
                      + F.col("tf").cast("double") / (F.lit(mu) * pc))
                + F.log(F.lit(mu) / (F.col("dl") + F.lit(mu))),
            )
        elif self.similarity == "lmjm":
            # all-double lmjm (LMJelinekMercerSimilarity.java:54-59)
            lam, sttf = self.lmjm_lambda, self.sum_ttf
            pc = (F.col("total_term_freq") + F.lit(1.0)) / F.lit(
                sttf + 1.0
            )
            score = F.log(
                F.lit(1.0)
                + (F.lit(1.0 - lam) * F.col("tf").cast("double")
                   / F.col("dl"))
                / (F.lit(lam) * pc)
            )
        elif self.similarity == "classic":
            score = (
                F.sqrt(F.col("tf").cast("double"))
                * (F.log((F.lit(dc) + 1.0) / (F.col("doc_freq") + 1.0))
                   + F.lit(1.0))
                / F.sqrt(F.col("dl").cast("double"))
            )
        elif self.similarity in ("dfr", "ib", "dfi", "ax", "bool"):
            # SimilarityBase family (similarities.py): all-double gate
            # formula with exact dl, same operation order as the
            # DuckDB twins
            from .similarities import gate_sql_col

            score = gate_sql_col(self.similarity, dc, self.sum_ttf)
        else:
            score = (
                F.log(F.lit(1.0) + (F.lit(dc) - F.col("doc_freq") + 0.5)
                      / (F.col("doc_freq") + 0.5))
                * F.lit(k1 + 1.0)
                * F.col("tf").cast("double")
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1) * (F.lit(1.0 - b)
                                   + F.lit(b) * F.col("dl") / F.lit(avgdl))
                )
            )
        return (
            tp.join(F.broadcast(ts), "term")
            .join(dl, "doc_id")
            .withColumn("score", score)
            .select("term", "doc_id", "score")
        )

    def _scored_terms_df(self, terms: list[str]) -> DataFrame:
        """DF(term, doc_id, score) for all query terms in ONE
        partition-pruned scan + decode pass (score dtype per mode)."""
        terms = sorted(set(terms))
        if self.dtype == "float64":
            return self._scored_terms_df_double(terms)
        dfs = {
            r["term"]: (int(r["doc_freq"]), int(r["total_term_freq"]))
            for r in self._text_stats.filter(F.col("term").isin(terms)).collect()
        }
        post = self._pruned_postings(
            terms, ["term", "salt", "block_id", "kind", "first_doc",
                    "doc_count", "payload", "norms_payload"],
        )
        k1 = np.float32(self.k1)
        b = np.float32(self.b)
        doc_count = self.doc_count
        avgdl = (
            np.float32(self.sum_ttf / float(doc_count))
            if self.sum_ttf > 0
            else np.float32(1.0)
        )
        cache = (k1 * ((np.float32(1.0) - b) + b * NORM_TABLE / avgdl)).astype(
            np.float32
        )
        bc_dfs = self.spark.sparkContext.broadcast(dfs)
        classic = self.similarity == "classic"
        lmd = self.similarity == "lmd"
        lmjm = self.similarity == "lmjm"
        from .similarities import SIMBASE

        simbase = self.similarity in SIMBASE
        sim = self.similarity
        mu, lam = self.mu, self.lmjm_lambda
        sum_ttf = self.sum_ttf

        def score_blocks(batches):
            from ..oracle.smallfloat import byte315_to_float

            cnorm = (
                byte315_to_float(np.arange(256, dtype=np.uint8))
                if classic else None
            )
            if lmd or lmjm:
                # SimilarityBase docLen decode == BM25's NORM_TABLE
                from ..oracle.smallfloat import NORM_TABLE as lmd_dl
            wv_cache: dict[str, np.float32] = {}
            for pdf in batches:
                outs = []
                for row in pdf.itertuples(index=False):
                    docs, tfs = decode_block(
                        dict(
                            kind=row.kind,
                            payload=row.payload,
                            doc_count=row.doc_count,
                            first_doc=row.first_doc,
                            block_id=row.block_id,
                        )
                    )
                    norms = np.frombuffer(row.norms_payload, dtype=np.uint8)
                    wv = wv_cache.get(row.term)
                    if wv is None:
                        df_t, ttf_t = bc_dfs.value.get(row.term, (0, 0))
                        if simbase:
                            # SimilarityBase weight IS the stats pair
                            wv = (df_t, ttf_t)
                        elif lmd or lmjm:
                            # float32 pc (DefaultCollectionModel +1F)
                            wv = np.float32(
                                np.float32(ttf_t + 1.0)
                                / np.float32(sum_ttf + 1.0)
                            )
                        elif classic:
                            wv = np.float32(
                                np.log((doc_count + 1) / float(df_t + 1))
                                + 1.0
                            )
                        else:
                            idf = np.float32(
                                np.log(1 + (doc_count - df_t + 0.5)
                                       / (df_t + 0.5))
                            )
                            wv = np.float32(idf * (k1 + np.float32(1.0)))
                        wv_cache[row.term] = wv
                    freq = tfs.astype(np.float32)
                    if simbase:
                        # LocalSearcher float discipline via the shared
                        # kernel (similarities.serving_scores)
                        from .similarities import serving_scores

                        sc = serving_scores(
                            sim, freq, norms, [wv], doc_count, sum_ttf,
                            avgdl,
                        )
                    elif lmd:
                        # LocalSearcher._lmd_score float discipline
                        dl64 = lmd_dl[norms].astype(np.float64)
                        s = (
                            np.log1p(freq.astype(np.float64)
                                     / (mu * float(wv)))
                            + np.log(mu / (dl64 + mu))
                        ).astype(np.float32)
                        sc = np.maximum(s, np.float32(0.0))
                    elif lmjm:
                        # LocalSearcher._lmjm_score float discipline
                        dl64 = lmd_dl[norms].astype(np.float64)
                        sc = np.log1p(
                            ((1.0 - lam) * freq.astype(np.float64) / dl64)
                            / (lam * float(wv))
                        ).astype(np.float32)
                    elif classic:
                        raw = (np.sqrt(freq, dtype=np.float32) * wv).astype(
                            np.float32
                        )
                        sc = (raw * cnorm[norms]).astype(np.float32)
                    else:
                        sc = (wv * freq / (freq + cache[norms])).astype(
                            np.float32
                        )
                    outs.append(
                        pd.DataFrame(
                            {"term": row.term, "doc_id": docs, "score": sc}
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return post.mapInPandas(
            score_blocks, "term string, doc_id long, score float"
        )

    def _fterm_plan(self, field: str, value: str,
                    clause_idx: list[int]) -> DataFrame:
        """Keyword-field TermQuery plan: decode the (field, value)
        posting list (bucket-pruned scan) and attach the constant
        omitNorms BM25 score (tf is always 1 for StringField values, so
        the score idf*(k1+1)*1/(1+k1) is a per-query literal computed
        with the engine's float discipline)."""
        i = clause_idx[0]
        clause_idx[0] += 1
        docs = self._decoded_tf_df_for_field(field, value)
        row = (
            self._term_stats.filter(
                (F.col("field") == field) & (F.col("term") == value)
            ).select("doc_freq", "total_term_freq").collect()
        )
        df_t = int(row[0]["doc_freq"]) if row else 0
        ttf_t = int(row[0]["total_term_freq"]) if row else 0
        from ..index.builder import read_field_stats

        fs_f = read_field_stats(self.index_dir, field)
        dc_f = int(fs_f["doc_count"] or 0)
        if self.similarity in ("lmd", "lmjm"):
            # norms == null -> docLen = 1F (SimilarityBase.simScorer);
            # pc over the FIELD's token count, LocalSearcher discipline
            sttf_f = int(fs_f["sum_total_term_freq"] or 0)
            mu, lam = self.mu, self.lmjm_lambda
            if self.dtype == "float32":
                pc = float(np.float32(
                    np.float32(ttf_t + 1.0) / np.float32(sttf_f + 1.0)
                ))
            else:
                pc = (ttf_t + 1.0) / (sttf_f + 1.0)
            if self.dtype == "float32":
                # engine float discipline: float64 log1p, float32 cast
                if self.similarity == "lmjm":
                    sc = float(np.float32(
                        np.log1p(((1.0 - lam) * 1.0) / (lam * pc))
                    ))
                else:
                    sc = float(max(np.float32(
                        np.log1p(1.0 / (mu * pc)) + np.log(mu / (1.0 + mu))
                    ), np.float32(0.0)))
            elif self.similarity == "lmjm":
                sc = math.log(1.0 + ((1.0 - lam) * 1.0) / (lam * pc))
            else:
                sc = max(0.0, math.log(1.0 + 1.0 / (mu * pc))
                         + math.log(mu / (1.0 + mu)))
        elif self.similarity in ("dfr", "ib", "dfi", "ax", "bool"):
            # SimilarityBase family: norms == null -> docLen = 1F and
            # tf = 1 (StringField), so the score is a per-query
            # constant; per-FIELD stats with the fillBasicStats
            # sttf<=0 fallback (tokens=docFreq, avgdl=1)
            from .similarities import gate_scores, serving_scores

            sttf_f = int(fs_f["sum_total_term_freq"] or 0)
            one = np.ones(1, dtype=np.float32)
            if sttf_f > 0 and dc_f > 0:
                tokens_f = sttf_f
                avgdl_f = np.float32(sttf_f / float(dc_f))
            else:
                tokens_f, avgdl_f = max(df_t, 1), np.float32(1.0)
            dc_f = max(dc_f, 1)  # empty field: no postings anyway
            if self.dtype == "float32":
                sc = float(serving_scores(
                    self.similarity, one, None, [(df_t, ttf_t)], dc_f,
                    tokens_f, avgdl_f, dl=one,
                )[0])
            else:
                # gate_scores' avgdl = tokens/docs in double; emulate
                # the sttf<=0 fallback by passing tokens_f as sum_ttf
                sc = float(gate_scores(
                    self.similarity, np.ones(1), np.ones(1),
                    [(df_t, ttf_t)], dc_f, tokens_f,
                )[0])
        elif self.similarity == "classic":
            # norms == null -> raw = tf(1) * idf (TFIDFSimScorer)
            if self.dtype == "float32":
                sc = float(np.float32(
                    np.log((dc_f + 1) / float(df_t + 1)) + 1.0
                ))
            else:
                sc = math.log((dc_f + 1.0) / (df_t + 1.0)) + 1.0
        elif self.dtype == "float32":
            k1 = np.float32(self.k1)
            idf = np.float32(np.log(1 + (dc_f - df_t + 0.5) / (df_t + 0.5)))
            wv = np.float32(idf * (k1 + np.float32(1.0)))
            one = np.float32(1.0)
            sc = float(np.float32(wv * one / (one + k1)))
        else:
            idf = math.log(1.0 + (dc_f - df_t + 0.5) / (df_t + 0.5))
            sc = idf * (self.k1 + 1.0) * 1.0 / (1.0 + self.k1)
        return docs.select(
            "doc_id",
            F.lit(sc).cast(self._st).alias("score"),
            F.lit(i).alias("cidx"),
        )

    def _decoded_tf_df_for_field(self, field: str, value: str) -> DataFrame:
        post = self._pruned_postings(
            [value], ["term", "kind", "first_doc", "block_id", "doc_count",
                      "payload"], field=field,
        )

        def dec(batches):
            for pdf in batches:
                outs = []
                for row in pdf.itertuples(index=False):
                    docs, _ = decode_block(
                        dict(kind=row.kind, payload=row.payload,
                             doc_count=row.doc_count, first_doc=row.first_doc,
                             block_id=row.block_id)
                    )
                    outs.append(pd.DataFrame({"doc_id": docs}))
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return post.mapInPandas(dec, "doc_id long")

    def _phrase_positions_df(self, terms: list[str]) -> DataFrame:
        """DF(term, doc_id, norm int, pos array<long>): decoded positions
        for the phrase terms, one partition-pruned scan."""
        post = self._pruned_postings(
            terms, ["term", "kind", "first_doc", "block_id", "doc_count",
                    "payload", "norms_payload", "pos_payload"],
        )

        def dec(batches):
            from ..index.codec import decode_positions

            for pdf in batches:
                outs = []
                for row in pdf.itertuples(index=False):
                    if row.pos_payload is None:
                        raise ValueError(
                            f"term {row.term!r}: index has no positions "
                            "(build with BuildConfig(positions=True))"
                        )
                    docs, tfs = decode_block(
                        dict(kind=row.kind, payload=row.payload,
                             doc_count=row.doc_count, first_doc=row.first_doc,
                             block_id=row.block_id)
                    )
                    norms = np.frombuffer(row.norms_payload, dtype=np.uint8)
                    outs.append(pd.DataFrame(
                        {"term": row.term, "doc_id": docs,
                         "norm": norms.astype("int32"),
                         "pos": decode_positions(row.pos_payload, tfs)}
                    ))
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return post.mapInPandas(
            dec, "term string, doc_id long, norm int, pos array<long>"
        )

    def _freq_weights(self, dfs: dict, terms: list):
        """Clause weights for the shared phrase/span freq->score kernel
        (`_score_freq_batch`), per similarity and mode.  `dfs` maps
        term -> (doc_freq, total_term_freq); `terms` lists the scoring
        clauses (duplicates included for phrases, deduplicated for
        spans — mirroring the termStats[] handed to
        Similarity.computeWeight / SpanWeight.buildSimWeight).

        Returns (wv, cache, idf_sum_d, lmd_w), unused slots None:
        - float32 serving: `wv` the summed-idf weight (bm25 *(k1+1),
          classic raw), `cache` the bm25 norm cache; for "lmd"
          instead `lmd_w` = float32 collection probability per clause
          (LMSimilarity.DefaultCollectionModel float division);
        - float64 gate: `idf_sum_d` the summed double idf; for "lmd"
          `lmd_w` = exact double (ttf+1)/(sttf+1) per clause, matching
          the all-double ANSI-SQL twin."""
        dc = self.doc_count
        classic = self.similarity == "classic"
        from .similarities import SIMBASE

        if self.similarity in SIMBASE:
            # SimilarityBase family: the per-clause (df, ttf) stats
            # pairs ARE the weight (both modes); the shared kernel
            # dispatches on sim
            sb_w = [dfs.get(t, (0, 0)) for t in terms]
            return None, None, None, sb_w
        if self.similarity in ("lmd", "lmjm"):
            ttfs = [dfs.get(t, (0, 0))[1] for t in terms]
            if self.dtype == "float32":
                lmd_w = np.array(
                    [np.float32(np.float32(ttf + 1.0)
                                / np.float32(self.sum_ttf + 1.0))
                     for ttf in ttfs], dtype=np.float32)
            else:
                lmd_w = np.array(
                    [(ttf + 1.0) / (self.sum_ttf + 1.0) for ttf in ttfs],
                    dtype=np.float64)
            return None, None, None, lmd_w
        if self.dtype == "float32":
            k1f = np.float32(self.k1)
            bf = np.float32(self.b)
            avgdl_f = (
                np.float32(self.sum_ttf / float(dc))
                if self.sum_ttf > 0 else np.float32(1.0)
            )
            cache = (
                k1f * ((np.float32(1.0) - bf) + bf * NORM_TABLE / avgdl_f)
            ).astype(np.float32)
            idf_sum = np.float32(0.0)
            for t in terms:
                df_t = dfs.get(t, (0, 0))[0]
                idf_sum = np.float32(idf_sum + (
                    np.float32(np.log((dc + 1) / float(df_t + 1)) + 1.0)
                    if classic else
                    np.float32(np.log(1 + (dc - df_t + 0.5) / (df_t + 0.5)))
                ))
            wv = (
                idf_sum if classic
                else np.float32(idf_sum * (k1f + np.float32(1.0)))
            )
            return wv, cache, None, None
        idf_sum_d = sum(
            (math.log((dc + 1.0) / (dfs.get(t, (0, 0))[0] + 1.0)) + 1.0)
            if classic else
            math.log(1.0 + (dc - dfs.get(t, (0, 0))[0] + 0.5)
                     / (dfs.get(t, (0, 0))[0] + 0.5))
            for t in terms
        )
        return None, None, idf_sum_d, None

    def _phrase_plan(self, clauses, slop: int,
                     clause_idx: list[int]) -> DataFrame:
        """Distributed Exact/SloppyPhraseScorer (VERDICT r1 item 2 — the
        proven DF plan folded in from the gate): decode positions for the
        phrase terms in one pruned scan, inner-join clauses on doc_id (so
        only docs containing EVERY term reach Python), then an
        Arrow-batched kernel computes the phrase freq (start-position
        intersection / sloppy.py greedy windows) and the BM25 score with
        the summed clause idfs — float32 in serving mode, double + exact
        dl in gate mode (semantics per search/ExactPhraseScorer.java and
        SloppyPhraseScorer.java)."""
        i = clause_idx[0]
        clause_idx[0] += 1
        terms = [t for t, _ in clauses]
        pos_df = self._phrase_positions_df(sorted(set(terms)))
        joined = None
        for j, (t, _rel) in enumerate(clauses):
            sel = [F.col("doc_id"), F.col("pos").alias(f"p{j}")]
            if j == 0:
                sel.append("norm")
            cdf = pos_df.filter(F.col("term") == t).select(*sel)
            joined = cdf if joined is None else joined.join(cdf, "doc_id")
        dfs = {
            r["term"]: (int(r["doc_freq"]), int(r["total_term_freq"]))
            for r in self._text_stats.filter(F.col("term").isin(terms))
            .collect()
        }
        if self.dtype == "float64":
            dl_df = self.spark.read.parquet(
                os.path.join(self.index_dir, "docmap")
            ).select("doc_id", "dl")
            joined = joined.join(dl_df, "doc_id")
        rels = [rel for _, rel in clauses]
        n_cl = len(clauses)
        dc, k1d, bd, avgdl_d = self.doc_count, self.k1, self.b, self._avgdl
        sttf = self.sum_ttf
        dtype = self.dtype
        st = self._st
        sim = self.similarity
        wv, cache, idf_sum_d, lmd_w = self._freq_weights(dfs, terms)
        mu, lam = self.mu, self.lmjm_lambda

        from .sloppy import repeat_groups

        groups = repeat_groups(terms)

        def _exact_freqs_batch(cols, n) -> np.ndarray:
            """Vectorized ExactPhraseScorer counts for a whole Arrow
            batch (the spans_batch.py CSR discipline — no per-row
            Python): encode every (row, offset-adjusted position) as
            row*M + pos and intersect the n_cl encoded arrays ONCE
            globally.  Keys are unique per clause and rows never
            collide, so the global sorted intersection equals the
            per-row start-position intersection; counting survivors
            per row via bincount yields the phrase freqs."""
            shift = max(rels)  # keep adjusted positions >= 0
            enc = []
            for j in range(n_cl):
                lens = np.fromiter(
                    (len(a) for a in cols[j]), dtype=np.int64, count=n
                )
                flat = (np.concatenate(cols[j])
                        if lens.sum() else np.empty(0, np.int64))
                row = np.repeat(np.arange(n, dtype=np.int64), lens)
                enc.append((row, np.asarray(flat, dtype=np.int64)
                            - rels[j] + shift))
            m = 1 + max(
                (int(p.max()) for _r, p in enc if p.size), default=0
            )
            base = enc[0][0] * m + enc[0][1]
            for row, pos in enc[1:]:
                if base.size == 0:
                    break
                base = np.intersect1d(base, row * m + pos,
                                      assume_unique=True)
            freqs = np.zeros(n, dtype=np.float32)
            if base.size:
                # a start position is valid only when the FIRST clause
                # position is >= 0, i.e. encoded pos part >= shift
                ok = base[(base % m) >= shift]
                if ok.size:
                    cnt = np.bincount(ok // m, minlength=n)
                    freqs[:] = cnt.astype(np.float32)
            return freqs

        def score_phrase(batches):
            from .sloppy import sloppy_freq

            for pdf in batches:
                n = len(pdf)
                cols = [pdf[f"p{j}"].to_numpy() for j in range(n_cl)]
                if slop == 0:
                    freqs = _exact_freqs_batch(cols, n)
                else:
                    # sloppy stays per-candidate: SloppyPhraseScorer's
                    # greedy window walk (heap + repeat-group collision
                    # resolution) is order-dependent per doc; the loop
                    # is bounded by docs containing EVERY phrase term
                    freqs = np.zeros(n, dtype=np.float32)
                    for r in range(n):
                        arrs = [
                            np.asarray(cols[j][r], dtype=np.int64)
                            - rels[j]
                            for j in range(n_cl)
                        ]
                        freqs[r] = sloppy_freq(arrs, rels, slop, groups)
                keep = freqs > 0
                sc = _score_freq_batch(
                    freqs, pdf, sim, dtype, wv, cache, idf_sum_d,
                    k1d, bd, avgdl_d, lmd_w, mu, lam, dc, sttf,
                )
                out = pd.DataFrame(
                    {"doc_id": pdf["doc_id"].to_numpy()[keep],
                     "score": sc[keep]}
                )
                out["cidx"] = i
                yield out

        return joined.mapInPandas(
            score_phrase, f"doc_id long, score {st}, cidx int"
        )

    def _span_cand_df(self, clause, pos_df: DataFrame) -> DataFrame:
        """DF(doc_id) of docs that can match a span clause — the
        two-phase doc-level approximation: term -> its posting docs,
        or -> union, near -> conjunction (left_semi join),
        containing/within -> ConjunctionSpans(big, little),
        first/range/not -> the match/include side.  `pos_df` is the
        positions-FREE doc decode (candidates never pay position
        decoding; only the final per-doc aggregation does)."""
        kind = clause[0]
        if kind == "sterm":
            return pos_df.filter(F.col("term") == clause[1]).select("doc_id")
        if kind == "sor":
            return (
                pos_df.filter(F.col("term").isin(list(clause[1])))
                .select("doc_id")
                .distinct()
            )
        if kind == "span_near":
            out = None
            for c in clause[1]:
                cd = self._span_cand_df(c, pos_df)
                out = cd if out is None else out.join(cd, "doc_id", "left_semi")
            return out
        if kind in ("span_first", "span_not", "span_range"):
            return self._span_cand_df(clause[1], pos_df)
        if kind in ("span_containing", "span_within"):
            return self._span_cand_df(clause[1], pos_df).join(
                self._span_cand_df(clause[2], pos_df), "doc_id", "left_semi"
            )
        raise ValueError(kind)

    def _span_plan(self, node, clause_idx: list[int]) -> DataFrame:
        """Distributed span execution (SpanWeight.java /
        NearSpansOrdered.java:88-118 / SpanScorer.java:90-110 — VERDICT
        r2 item 1): ONE pruned position scan for every span term, a
        doc-level candidate conjunction/union per the clause tree, then
        an Arrow-batched kernel enumerates matches per doc with the
        shared span spec (query/spans.py semantics, batch CSR kernels
        from query/spans_batch.py — no per-doc Python) and scores the
        float32 freq = sum 1/(1+width).  The kernel runs on executors
        over only the candidate docs — no driver-side evaluation."""
        from .spans import span_terms

        i = clause_idx[0]
        clause_idx[0] += 1
        all_terms = sorted(set(span_terms(node)))
        pos_df = self._phrase_positions_df(all_terms)
        cand = self._span_cand_df(node, self._decoded_tf_df(all_terms))
        agg = (
            pos_df.join(cand, "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(
                F.collect_list(F.struct("term", "pos")).alias("tp"),
                F.min("norm").alias("norm"),
            )
        )
        if self.dtype == "float64":
            dl_df = self.spark.read.parquet(
                os.path.join(self.index_dir, "docmap")
            ).select("doc_id", "dl")
            agg = agg.join(dl_df, "doc_id")
        # scoring weight: summed idf of the DEDUPLICATED scoring terms
        # (SpanWeight.buildSimWeight term map)
        sterms = sorted(set(span_terms(node, scoring=True, top=True)))
        dfs = {
            r["term"]: (int(r["doc_freq"]), int(r["total_term_freq"]))
            for r in self._text_stats.filter(F.col("term").isin(sterms))
            .collect()
        }
        dc, k1d, bd, avgdl_d = self.doc_count, self.k1, self.b, self._avgdl
        sttf = self.sum_ttf
        dtype, st = self.dtype, self._st
        sim = self.similarity
        wv, cache, idf_sum_d, lmd_w = self._freq_weights(dfs, sterms)
        mu, lam = self.mu, self.lmjm_lambda

        def score_spans(batches):
            from .spans_batch import (
                batch_doc_spans, batch_span_freqs, empty, from_positions,
            )

            for pdf in batches:
                n = len(pdf)
                tps = pdf["tp"].tolist()
                # CSR per term (one cheap structural pass), then the
                # vectorized batch kernels — no per-doc enumeration
                per_term: dict[str, list] = {t: [None] * n
                                             for t in all_terms}
                for r in range(n):
                    for e in tps[r]:
                        lst = per_term.get(e["term"])
                        if lst is not None:
                            lst[r] = np.asarray(e["pos"], dtype=np.int64)
                bs_cache = {
                    t: from_positions(pl, n) for t, pl in per_term.items()
                }

                def term_batch(t, _c=bs_cache, _n=n):
                    bs = _c.get(t)
                    return bs if bs is not None else empty(_n)

                freqs = batch_span_freqs(
                    batch_doc_spans(node, n, term_batch)
                )
                keep = freqs > 0
                sc = _score_freq_batch(
                    freqs, pdf, sim, dtype, wv, cache, idf_sum_d,
                    k1d, bd, avgdl_d, lmd_w, mu, lam, dc, sttf,
                )
                out = pd.DataFrame(
                    {"doc_id": pdf["doc_id"].to_numpy()[keep],
                     "score": sc[keep]}
                )
                out["cidx"] = i
                yield out

        return agg.mapInPandas(
            score_spans, f"doc_id long, score {st}, cidx int"
        )

    def _plan(self, node, scored: DataFrame, clause_idx: list[int]) -> DataFrame:
        """Recursively build DF(doc_id, score, cidx) for a query node
        (score typed per self.dtype)."""
        from .spans import SPAN_KINDS

        st = self._st
        kind = node[0]
        if kind in SPAN_KINDS:
            return self._span_plan(node, clause_idx)
        if kind == "term":
            i = clause_idx[0]
            clause_idx[0] += 1
            return (
                scored.filter(F.col("term") == node[1])
                .select("doc_id", "score")
                .withColumn("cidx", F.lit(i))
            )
        if kind == "matchnone":
            i = clause_idx[0]
            clause_idx[0] += 1
            return self.spark.createDataFrame(
                [], f"doc_id long, score {st}, cidx int"
            )
        if kind == "synonym":
            return self._synonym_plan(list(node[1]), clause_idx)
        if kind == "const_or":
            # constant-score union (MultiTermQueryConstantScoreWrapper)
            i = clause_idx[0]
            clause_idx[0] += 1
            return (
                scored.filter(F.col("term").isin(list(node[1])))
                .select("doc_id")
                .distinct()
                .select(
                    "doc_id",
                    F.lit(1.0).cast(st).alias("score"),
                    F.lit(i).alias("cidx"),
                )
            )
        if kind == "boost":
            ch = self._plan(node[1], scored, clause_idx)
            return ch.withColumn(
                "score",
                (F.col("score") * F.lit(float(node[2]))).cast(st),
            )
        if kind == "andnot":
            pos = self._plan(node[1], scored, clause_idx)
            neg = self._plan(node[2], scored, clause_idx)
            return pos.join(neg.select("doc_id"), "doc_id", "left_anti")
        if kind == "reqopt":
            req = self._plan(node[1], scored, clause_idx)
            opt = self._plan(node[2], scored, clause_idx)
            j = req.join(
                opt.select("doc_id", F.col("score").alias("opt_s")),
                "doc_id",
                "left_outer",
            )
            return j.select(
                "doc_id",
                (
                    F.col("score").cast("double")
                    + F.coalesce(F.col("opt_s").cast("double"), F.lit(0.0))
                ).cast(st).alias("score"),
                "cidx",
            )
        if kind == "fterm":
            return self._fterm_plan(node[1], node[2], clause_idx)
        if kind == "tsrange":
            # PointRangeQuery analogue: the ts predicate pushes into the
            # docmap parquet scan (constant score 1.0 as a scoring clause)
            i = clause_idx[0]
            clause_idx[0] += 1
            _, lo, hi, il, ih = node
            dm = self.spark.read.parquet(
                os.path.join(self.index_dir, "docmap")
            ).select("doc_id", "ts")
            cond = F.col("ts").isNotNull()
            if lo is not None:
                lov = F.lit(lo).cast("timestamp")
                cond = cond & (F.col("ts") >= lov if il else F.col("ts") > lov)
            if hi is not None:
                hiv = F.lit(hi).cast("timestamp")
                cond = cond & (F.col("ts") <= hiv if ih else F.col("ts") < hiv)
            return dm.filter(cond).select(
                "doc_id",
                F.lit(1.0).cast(st).alias("score"),
                F.lit(i).alias("cidx"),
            )
        if kind == "reqfilter":
            pos = self._plan(node[1], scored, clause_idx)
            filt = self._plan(node[2], scored, clause_idx)
            return pos.join(
                filt.select("doc_id"), "doc_id", "left_semi"
            )
        if kind == "filter0":
            filt = self._plan(node[1], scored, clause_idx)
            return filt.select(
                "doc_id",
                F.lit(0.0).cast(st).alias("score"),
                "cidx",
            )
        if kind == "phrase":
            return self._phrase_plan(
                node[1], node[2] if len(node) > 2 else 0, clause_idx
            )
        if kind == "msm_or":
            # MinShouldMatchSumScorer: keep docs matching >= n SHOULD
            # clauses, clause-order double sum of the matching scores
            n = node[1]
            children = [self._plan(c, scored, clause_idx) for c in node[2]]
            u = children[0]
            for ch in children[1:]:
                u = u.unionByName(ch)
            agg = u.groupBy("doc_id").agg(
                F.aggregate(
                    F.sort_array(
                        F.collect_list(F.struct("cidx", F.col("score")))
                    ),
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + x["score"].cast("double"),
                ).alias("s"),
                F.count("*").alias("nm"),
                F.min("cidx").alias("cidx"),
            ).filter(F.col("nm") >= n)
            return agg.select(
                "doc_id", F.col("s").cast(st).alias("score"), "cidx"
            )
        if kind == "dismax":
            return self._dismax_plan(node, scored, clause_idx)
        children = [self._plan(c, scored, clause_idx) for c in node[1]]
        if kind == "and":
            acc = children[0].select(
                "doc_id", F.col("score").cast("double").alias("s"), "cidx"
            )
            for ch in children[1:]:
                acc = acc.join(
                    ch.select("doc_id", F.col("score").cast("double").alias("s2")),
                    "doc_id",
                ).select(
                    "doc_id", (F.col("s") + F.col("s2")).alias("s"), "cidx"
                )
            return acc.select(
                "doc_id", F.col("s").cast(st).alias("score"), "cidx"
            )
        if kind == "or":
            u = children[0]
            for ch in children[1:]:
                u = u.unionByName(ch)
            # deterministic clause-order double sum (matches
            # DisjunctionSumScorer accumulation in clause order)
            agg = u.groupBy("doc_id").agg(
                F.aggregate(
                    F.sort_array(
                        F.collect_list(F.struct("cidx", F.col("score")))
                    ),
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + x["score"].cast("double"),
                ).alias("s"),
                F.min("cidx").alias("cidx"),
            )
            return agg.select(
                "doc_id", F.col("s").cast(st).alias("score"), "cidx"
            )
        raise ValueError(kind)

    def _dismax_plan(self, node, scored: DataFrame,
                     clause_idx: list[int]) -> DataFrame:
        """DisjunctionMaxScorer as ONE hash aggregate
        (DisjunctionMaxQuery.java:47-63, DisjunctionMaxScorer.java:
        49-61): union the disjunct plans (each already a pruned scan /
        subplan), then per doc score = max + tie * (sum - max) with
        the or-node's deterministic clause-order double sum and a
        double max — the same single-shuffle shape as a plain OR, so
        the tie-break scoring adds no extra exchange at any scale."""
        st = self._st
        tie = float(node[2])
        children = [self._plan(c, scored, clause_idx) for c in node[1]]
        u = children[0]
        for ch in children[1:]:
            u = u.unionByName(ch)
        agg = u.groupBy("doc_id").agg(
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.struct("cidx", F.col("score")))
                ),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x["score"].cast("double"),
            ).alias("s"),
            F.max(F.col("score").cast("double")).alias("mx"),
            F.min("cidx").alias("cidx"),
        )
        return agg.select(
            "doc_id",
            (F.col("mx")
             + (F.col("s") - F.col("mx")) * F.lit(tie))
            .cast(st).alias("score"),
            "cidx",
        )

    # ---------------------------------------------------------- rewrite
    def rewrite(self, node):
        """Expand multi-term nodes with DataFrame-native predicates on the
        term dictionary (SURVEY.md §2.2: terms.filter(startswith / rlike /
        levenshtein <= n)); fuzzy falls back to the shared OSA helper for
        exact FuzzyQuery transposition semantics.  Expansions are capped
        at MAX_CLAUSE_COUNT verified terms (BooleanQuery.java:43) via a
        limit() pushed into the dictionary scan."""
        from .multiterm import (
            MAX_CLAUSE_COUNT, MULTI_TERM_KINDS, TooManyClauses, expand_fuzzy,
            wildcard_regex,
        )

        def _capped(terms: list[str]) -> tuple:
            if len(terms) > MAX_CLAUSE_COUNT:
                raise TooManyClauses(len(terms))
            return ("const_or", sorted(terms)) if terms else ("matchnone",)

        if node is None:
            return None
        kind = node[0]
        if kind in MULTI_TERM_KINDS:
            t = F.col("term")
            if kind == "prefix":
                cond = t.startswith(node[1])
            elif kind == "wildcard":
                cond = t.rlike(f"^(?:{wildcard_regex(node[1]).pattern})$")
            elif kind == "regexp":
                cond = t.rlike(f"^(?:{node[1]})$")
            elif kind == "range":
                lo, hi, il, ih = node[1], node[2], node[3], node[4]
                cond = F.lit(True)
                if lo is not None:
                    cond = cond & (t >= lo if il else t > lo)
                if hi is not None:
                    cond = cond & (t <= hi if ih else t < hi)
            else:  # fuzzy: cheap levenshtein prefilter, exact OSA verify
                # length window first (spell.py:60-90 discipline): OSA
                # distance >= |len(a) - len(b)|, so terms outside
                # len(query) +/- max_edits can never match — the cheap
                # codegen length predicate short-circuits the O(n*m)
                # levenshtein on the rest of the dictionary instead of
                # running it on every row (VERDICT r4 item 7).
                # sound bound: one OSA transposition = two Levenshtein
                # edits, so Levenshtein(a,b) <= 2*OSA(a,b) always; the
                # previous `<= max_edits + 1` bound dropped terms at OSA
                # distance 2 reached via two transpositions (Levenshtein 4)
                qlen = len(node[1])
                cand = [
                    r["term"]
                    for r in self._text_stats.filter(
                        (F.length(t) >= qlen - node[2])
                        & (F.length(t) <= qlen + node[2])
                        & (F.levenshtein(t, F.lit(node[1]))
                           <= 2 * node[2])
                    ).select("term").collect()
                ]
                return _capped(expand_fuzzy(cand, node[1], node[2]))
            terms = [
                r["term"]
                for r in self._text_stats.filter(cond)
                .select("term")
                .limit(MAX_CLAUSE_COUNT + 1)
                .collect()
            ]
            return _capped(terms)
        if kind == "span_multi":
            # SpanMultiTermQueryWrapper -> SpanOr of the expanded terms
            # (SpanRewriteMethod); reuse the DataFrame-native expansion
            inner = self.rewrite(node[1])
            if inner[0] == "matchnone":
                return ("sor", [])
            return ("sor", list(inner[1]))
        if kind == "span_near":
            return ("span_near", [self.rewrite(c) for c in node[1]],
                    node[2], node[3])
        if kind in ("span_first", "span_range"):
            return (kind, self.rewrite(node[1])) + tuple(node[2:])
        if kind in ("span_not", "span_containing", "span_within"):
            return (kind, self.rewrite(node[1]),
                    self.rewrite(node[2])) + tuple(node[3:])
        if kind in ("and", "or"):
            return (kind, [self.rewrite(c) for c in node[1]])
        if kind == "dismax":
            return ("dismax", [self.rewrite(c) for c in node[1]], node[2])
        if kind == "msm_or":
            return ("msm_or", node[1], [self.rewrite(c) for c in node[2]])
        if kind in ("andnot", "reqopt", "reqfilter"):
            return (kind, self.rewrite(node[1]), self.rewrite(node[2]))
        if kind == "boost":
            return ("boost", self.rewrite(node[1]), node[2])
        if kind == "filter0":
            return ("filter0", self.rewrite(node[1]))
        return node

    # ------------------------------------------------------------- api
    def search_df(self, query, k: int = 10, after=None) -> DataFrame:
        """Top-k as a DataFrame(doc_id long, score float) — composable
        with join-back to the source table (stored-fields fetch).
        `after` = (doc_id, score) keyset cursor: only docs strictly
        after it in (score desc, docID asc) order are returned (the
        distributed searchAfter — TopDocs.merge honors the cursor on
        every shard before the final merge)."""
        node = parse_query(query, opts=self.analyzer_opts) if isinstance(query, str) else query
        node = self.rewrite(node)
        if node is None or node[0] == "matchnone":
            return self.spark.createDataFrame(
                [], f"doc_id long, score {self._st}"
            )
        terms = _terms_of(node)
        scored = self._scored_terms_df(terms)
        plan = self._live(self._plan(node, scored, [0]))
        if after is not None:
            a_doc, a_score = int(after[0]), float(after[1])
            s_lit = F.lit(a_score).cast(self._st)
            plan = plan.filter(
                (F.col("score") < s_lit)
                | ((F.col("score") == s_lit) & (F.col("doc_id") > a_doc))
            )
        return (
            plan.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def search(self, query, k: int = 10) -> list[tuple[int, float]]:
        return [
            (int(r["doc_id"]), float(r["score"]))
            for r in self.search_df(query, k).collect()
        ]

    def matching_docs_df(self, query) -> DataFrame:
        """ALL matching docIDs, no ranking — the needsScores=false /
        FILTER path (BooleanQuery.java:184-205; Solr fq).  Returns
        DataFrame(doc_id long)."""
        node = parse_query(query, opts=self.analyzer_opts) if isinstance(query, str) else query
        node = self.rewrite(node)
        if node is None or node[0] == "matchnone":
            return self.spark.createDataFrame([], "doc_id long")
        scored = self._scored_terms_df(_terms_of(node))
        return self._live(self._plan(node, scored, [0])).select("doc_id")

    def search_conversations(self, query, k: int = 10,
                             mode: str = "max") -> DataFrame:
        """Parent/child block join: roll turn-level BM25 hits up to their
        conversations (ToParentBlockJoinQuery with ScoreMode.Max/Total,
        lucene/join/.../ToParentBlockJoinQuery.java) —
        groupBy(conv_id).agg(max|sum|avg(turn score)).  Returns
        DataFrame(conv_id, score float, n_hits) top-k by (score desc,
        conv_id asc)."""
        agg = {"max": F.max, "sum": F.sum, "avg": F.avg}[mode]
        node = parse_query(query, opts=self.analyzer_opts) if isinstance(query, str) else query
        node = self.rewrite(node)
        if node is None or node[0] == "matchnone":
            return self.spark.createDataFrame(
                [], f"conv_id string, score {self._st}, n_hits long"
            )
        terms = _terms_of(node)
        scored = self._scored_terms_df(terms)
        plan = self._live(
            self._plan(node, scored, [0])
        ).select("doc_id", "score")
        docmap = self.spark.read.parquet(
            os.path.join(self.index_dir, "docmap")
        ).select("doc_id", "conv_id")
        return (
            plan.join(docmap, "doc_id")
            .groupBy("conv_id")
            .agg(
                agg(F.col("score").cast("double")).cast(self._st).alias("score"),
                F.count("*").alias("n_hits"),
            )
            .orderBy(F.desc("score"), F.asc("conv_id"))
            .limit(k)
        )

    def collapse_df(self, query, field: str, k: int = 10,
                    expand_k: int = 0) -> DataFrame:
        """Field collapsing + expand (solr/core/.../search/
        CollapsingQParserPlugin.java group-head selection,
        handler/component/ExpandComponent.java): keep ONE top-scoring
        doc per `field` group among the query's matches (head =
        (score desc, docID asc) min, the plugin's default max-score
        head), rank surviving heads by score, and with expand_k > 0
        also return up to expand_k non-head members per surviving
        group.  Returns DataFrame(group, doc_id, score, rank) where
        rank 1 is the collapsed head and 2..expand_k+1 the expansion.

        Skew discipline: a window partitioned by the group field alone
        would funnel ALL matches of a low-cardinality field (role has
        3 values) into as many tasks — a 100-TB bottleneck.  Instead
        the top-(1+expand_k) survivors are taken per (group, input
        partition) first (hash-distributed across ALL tasks — the
        per-segment head selection the reference does per leaf reader),
        and only the tiny per-partition survivor set (<= groups *
        partitions * (1+expand_k) rows) goes through the final
        per-group window — the TopDocs.merge shape applied to
        collapsing."""
        from pyspark.sql import Window

        node = parse_query(query, opts=self.analyzer_opts) if isinstance(query, str) else query
        node = self.rewrite(node)
        if node is None or node[0] == "matchnone":
            return self.spark.createDataFrame(
                [], f"group string, doc_id long, score {self._st}, rank int"
            )
        scored = self._scored_terms_df(_terms_of(node))
        plan = self._live(
            self._plan(node, scored, [0])
        ).select("doc_id", "score")
        docmap = self.spark.read.parquet(
            os.path.join(self.index_dir, "docmap")
        ).select("doc_id", F.col(field).cast("string").alias("group"))
        keep_n = 1 + max(0, expand_k)
        w_part = Window.partitionBy("group", "_pid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        survivors = (
            plan.join(docmap, "doc_id")
            .withColumn("_pid", F.spark_partition_id())
            .withColumn("_prk", F.row_number().over(w_part))
            .filter(F.col("_prk") <= keep_n)
            .drop("_pid", "_prk")
        )
        w = Window.partitionBy("group").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        ranked = (
            survivors
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= keep_n)
        )
        heads = (
            ranked.filter(F.col("rank") == 1)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .select("group")
        )
        return (
            ranked.join(F.broadcast(heads), "group", "left_semi")
            .select("group", "doc_id", "score", "rank")
            .orderBy(F.asc("group"), F.asc("rank"))
        )

    def search_elevated_df(self, query, elevated_ids: list[int],
                           k: int = 10) -> DataFrame:
        """Query elevation (solr/core/.../handler/component/
        QueryElevationComponent.java): the configured doc ids rank
        ABOVE every organic hit, in configured order — the editorial
        "sponsored result" pin.  Elevated docs keep their organic score
        when they match the query and 0 otherwise (forceElevation:
        pinned even when not matching); organic results follow in
        (score desc, docID asc) order with the elevated ids excluded,
        k rows total.  One extra broadcast join over the normal plan —
        the elevation set is configuration-sized."""
        st = self._st
        node = parse_query(query, opts=self.analyzer_opts) if isinstance(query, str) else query
        node = self.rewrite(node)
        organic = (
            self._live(self._plan(node, self._scored_terms_df(
                _terms_of(node)), [0])).select("doc_id", "score")
            if node is not None and node[0] != "matchnone"
            else self.spark.createDataFrame([], f"doc_id long, score {st}")
        )
        elev = self.spark.createDataFrame(
            [(int(d), i) for i, d in enumerate(elevated_ids)],
            "doc_id long, _pos int",
        )
        # elevation never resurrects tombstoned docs: the reference's
        # QueryElevationComponent only pins LIVE docs (the elevated id
        # set is intersected with liveDocs at collection), so the
        # configured ids go through the same deletes anti-join as
        # organic hits — a config-sized input, so the join is free
        elev = self._live(elev)
        elev_rows = (
            elev.join(organic, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("score"), F.lit(0.0)).cast(st)
                .alias("score"),
                F.lit(True).alias("elevated"), "_pos",
            )
        )
        org_rows = (
            organic.join(F.broadcast(elev.select("doc_id")), "doc_id",
                         "left_anti")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", "score", F.lit(False).alias("elevated"),
                    F.lit(2**31 - 1).alias("_pos"))
        )
        return (
            elev_rows.unionByName(org_rows)
            .orderBy(F.desc("elevated"), F.asc("_pos"),
                     F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .drop("_pos")
        )

    def search_boosted_df(self, query, boost_expr: str,
                          cols: tuple[str, ...] = ("dl",),
                          k: int = 10) -> DataFrame:
        """Function-boosted search (Solr's `{!boost b=func(field)}` —
        search/BoostQParserPlugin.java wrapping a FunctionScoreQuery /
        BoostedQuery over a ValueSource): final score = relevance
        score × `boost_expr`, a SQL expression over the stored-field
        columns in `cols` (our docmap IS the DocValues store; the
        column-pruned doc_id join is the access path).  The canonical
        use is recency/quality boosting.  Evaluated entirely JVM-side
        (Catalyst expression), then the usual top-k."""
        st = self._st
        node = parse_query(query, opts=self.analyzer_opts) if isinstance(query, str) else query
        node = self.rewrite(node)
        if node is None or node[0] == "matchnone":
            return self.spark.createDataFrame(
                [], f"doc_id long, score {st}"
            )
        organic = self._live(
            self._plan(node, self._scored_terms_df(_terms_of(node)), [0])
        ).select("doc_id", "score")
        dm = self.spark.read.parquet(
            os.path.join(self.index_dir, "docmap")
        ).select("doc_id", *cols)
        return (
            organic.join(dm, "doc_id")
            .withColumn(
                "score",
                (F.col("score").cast("double")
                 * F.expr(boost_expr).cast("double")).cast(st),
            )
            .select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def rescore_df(self, query, rescore_query=None, weight: float = 1.0,
                   n: int = 50, k: int = 10, rescore_expr: str | None = None,
                   cols: tuple[str, ...] = ("dl",),
                   mode: str = "add") -> DataFrame:
        """Second-pass rescoring (search/QueryRescorer.java:51-140 /
        Rescorer.java; the Solr LTR rescorer role): take the
        first-pass top-`n` hits, score them with a SECOND query or a
        stored-field expression, and combine.

        - `rescore_query`: QueryRescorer's sugar combine (:165-177) —
          score = firstPassScore + weight * secondPassScore when the
          second query matches the hit, else firstPassScore unchanged.
        - `rescore_expr` (SQL over docmap columns in `cols` — the LTR
          model-score seam): mode 'add' -> first + weight*expr,
          'multiply' -> first * expr, 'replace' -> weight*expr.

        Re-sorted by (score desc, docID asc) and truncated to `k`,
        exactly the reference's post-combine comparator (:113-127).
        Two-phase at scale: the first pass is the normal pruned top-n
        (driver holds n rows), the second query's plan is evaluated
        restricted to those n docs via a broadcast join — the second
        pass never scans beyond the rescored candidate set's postings."""
        st = self._st
        first = self.search_df(query, n).select(
            "doc_id", F.col("score").cast("double").alias("s1")
        )
        if rescore_expr is not None:
            dm = self.spark.read.parquet(
                os.path.join(self.index_dir, "docmap")
            ).select("doc_id", *cols)
            joined = first.join(dm, "doc_id").withColumn(
                "s2", F.expr(rescore_expr).cast("double")
            )
            if mode == "replace":
                comb = F.lit(float(weight)) * F.col("s2")
            elif mode == "multiply":
                comb = F.col("s1") * F.col("s2")
            else:
                comb = F.col("s1") + F.lit(float(weight)) * F.col("s2")
        else:
            node2 = (parse_query(rescore_query)
                     if isinstance(rescore_query, str) else rescore_query)
            node2 = self.rewrite(node2)
            second = (
                self._plan(node2, self._scored_terms_df(_terms_of(node2)),
                           [0]).select(
                    "doc_id", F.col("score").cast("double").alias("s2")
                )
                if node2 is not None and node2[0] != "matchnone"
                else self.spark.createDataFrame([], "doc_id long, s2 double")
            )
            # first-pass set is n rows — broadcast so the second pass
            # is a map-side probe, no shuffle of the second plan
            joined = F.broadcast(first).join(second, "doc_id", "left")
            comb = (F.col("s1")
                    + F.lit(float(weight)) * F.coalesce("s2", F.lit(0.0)))
        return (
            joined.select("doc_id", comb.cast(st).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def fetch_topk_with_source(self, query, transcripts: DataFrame, k: int = 10
                               ) -> DataFrame:
        """Two-phase fetch (Solr GET_FIELDS): broadcast-join the tiny top-k
        back to docmap + source table for stored fields."""
        top = self.search_df(query, k)
        docmap = self.spark.read.parquet(os.path.join(self.index_dir, "docmap"))
        ids = docmap.join(F.broadcast(top), "doc_id")
        return (
            transcripts.join(
                F.broadcast(ids.select("doc_id", "score", "conv_id", "turn_idx")),
                ["conv_id", "turn_idx"],
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )


def _score_freq_batch(freqs, pdf, sim, dtype, wv, cache, idf_sum_d,
                      k1d, bd, avgdl_d, lmd_w=None, mu=2000.0, lam=0.1,
                      dc=0, sttf=0):
    """Shared phrase/span freq->score kernel per similarity and mode:
    float32 serving (quantized norm byte) or float64 gate (exact dl).
    `lmd_w` carries the per-clause collection probabilities for the LM
    family (per-clause scores summed per MultiSimScorer at the shared
    phrase/span freq); the serving path decodes docLen from the
    SimilarityBase norm byte (1/(f*f)) and keeps LocalSearcher's
    per-term-float32 sum discipline, the gate path is all-double with
    exact dl so an ANSI-SQL twin is bit-stable."""
    classic = sim == "classic"
    from .similarities import SIMBASE, gate_scores, serving_scores

    if sim in SIMBASE:
        # lmd_w slot carries the per-clause (df, ttf) pairs
        if dtype == "float32":
            norms = pdf["norm"].to_numpy().astype(np.uint8)
            avgdl_f = (
                np.float32(sttf / float(dc))
                if sttf > 0 and dc > 0 else np.float32(1.0)
            )
            return serving_scores(
                sim, freqs.astype(np.float32), norms, lmd_w, dc, sttf,
                avgdl_f,
            )
        return gate_scores(
            sim, freqs, pdf["dl"].to_numpy().astype(np.float64), lmd_w,
            dc, sttf,
        )
    if lmd_w is not None:
        lmjm = sim == "lmjm"
        if dtype == "float32":
            # SimilarityBase docLen decode == BM25's NORM_TABLE
            dl = NORM_TABLE[pdf["norm"].to_numpy().astype(np.uint8)].astype(
                np.float64
            )
            fq = freqs.astype(np.float64)
            dnorm = np.log(mu / (dl + mu))
            total = np.zeros(fq.size, dtype=np.float32)
            for pc in lmd_w:
                if lmjm:
                    s = np.log1p(
                        ((1.0 - lam) * fq / dl) / (lam * float(pc))
                    ).astype(np.float32)
                    total = (total + s).astype(np.float32)
                    continue
                s = (np.log1p(fq / (mu * float(pc))) + dnorm).astype(
                    np.float32
                )
                total = (
                    total + np.maximum(s, np.float32(0.0))
                ).astype(np.float32)
            return total
        dl = pdf["dl"].to_numpy().astype(np.float64)
        fq = freqs.astype(np.float64)
        dnorm = np.log(mu / (dl + mu))
        total_d = np.zeros(fq.size, dtype=np.float64)
        for pc in lmd_w:
            if lmjm:
                total_d += np.log(
                    1.0 + ((1.0 - lam) * fq / dl) / (lam * float(pc))
                )
            else:
                total_d += np.maximum(
                    np.log(1.0 + fq / (mu * float(pc))) + dnorm, 0.0
                )
        return total_d
    if dtype == "float32":
        if classic:
            from ..oracle.smallfloat import byte315_to_float

            cnorm = byte315_to_float(
                pdf["norm"].to_numpy().astype(np.uint8)
            )
            raw = (np.sqrt(freqs, dtype=np.float32) * wv).astype(np.float32)
            return (raw * cnorm).astype(np.float32)
        norms = pdf["norm"].to_numpy().astype(np.uint8)
        return (wv * freqs / (freqs + cache[norms])).astype(np.float32)
    dl = pdf["dl"].to_numpy().astype(np.float64)
    fq = freqs.astype(np.float64)
    if classic:
        return np.sqrt(fq) * idf_sum_d / np.sqrt(dl)
    return (
        idf_sum_d * (k1d + 1.0) * fq
        / (fq + k1d * ((1.0 - bd) + bd * dl / avgdl_d))
    )


def _terms_of(node) -> list[str]:
    """Text-field terms the shared scored-terms scan must cover (fterm /
    tsrange / span nodes plan their own pruned scans)."""
    from .spans import SPAN_KINDS

    kind = node[0]
    if kind in SPAN_KINDS:
        return []
    if kind == "term":
        return [node[1]]
    if kind == "const_or":
        return list(node[1])
    if kind == "synonym":
        return []  # plans its own summed-tf scan (_synonym_plan)
    if kind in ("matchnone", "fterm", "tsrange"):
        return []
    if kind in ("andnot", "reqopt", "reqfilter"):
        return _terms_of(node[1]) + _terms_of(node[2])
    if kind in ("boost", "filter0"):
        return _terms_of(node[1])
    if kind == "phrase":
        return [t for t, _ in node[1]]
    out = []
    for c in (node[2] if kind == "msm_or" else node[1]):
        out.extend(_terms_of(c))
    return out
