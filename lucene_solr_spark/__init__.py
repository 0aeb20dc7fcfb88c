"""lucene_solr_spark — a PySpark-native inverted-index build + BM25 query engine.

Brand-new engine (NOT a port) with the indexing/query semantics of Apache
Lucene 7.0 (reference at /root/reference):

- analysis:  StandardAnalyzer-semantics tokenizer (lowercase, 33-word English
             stop set, 255-char token limit, position gaps) as vectorized
             pandas UDFs.
- index:     distributed posting-list construction (docID deltas + tfs,
             FOR-bitpacked 128-blocks + VByte tail, per-block max-score
             metadata), term-bucket-partitioned parquet segments with
             lineage rows, hot-term salting, checkpoint-resumable build.
- query:     boolean AND/OR top-k BM25 (k1=1.2, b=0.75) rank-identical to
             Lucene: float32 per-term scores, double accumulation,
             (score desc, docID asc) tie-break; MaxScore/block-max pruning.
- oracle:    a pure numpy executable spec of the reference semantics used
             as the golden model in tests.
"""

__version__ = "0.1.0"
