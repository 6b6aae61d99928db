"""lucene_solr_spark — a PySpark-native full-text index + BM25 search engine.

A from-scratch re-expression of the capabilities of Apache Lucene/Solr
(reference: bloomberg/lucene-solr @ 7.0.0-SNAPSHOT) on top of the Spark
DataFrame API:

- ``analysis``  : StandardAnalyzer-equivalent tokenization (UAX#29-approx,
                  lowercase, 33 English stopwords with position gaps) as
                  vectorized pandas kernels (ref:
                  lucene/analysis/standard/StandardTokenizer.java).
- ``codecs``    : numpy VByte + FOR(128) bit-packing for posting payloads
                  (ref: codecs/lucene50/ForUtil.java, store/DataOutput.java).
- ``index``     : segmented inverted-index build over a corpus DataFrame,
                  segments manifest, tiered merge, CheckIndex-style validation
                  (ref: index/IndexWriter.java, TieredMergePolicy.java).
- ``scoring``   : bit-faithful float32 BM25 (k1=1.2, b=0.75) with byte315 norm
                  quantization (ref: search/similarities/BM25Similarity.java).
- ``queries``   : classic query parser subset, BooleanQuery rewrites,
                  DataFrame execution, top-k with block-max WAND
                  (ref: search/BooleanQuery.java, TopScoreDocCollector.java).
- ``functions`` : training-data pipeline ops — dedup (exact / MinHash-LSH /
                  SimHash / n-gram Jaccard), embedding ANN, text stats,
                  multimodal plumbing.
- ``streaming`` : incremental (TopicStream-style) and Structured Streaming
                  query surfaces.

Everything is DataFrame-first: Catalyst handles pushdown/pruning/join
selection; custom logic lives either above (the Python query planner) or
below (Arrow-vectorized pandas kernels) the DataFrame API.
"""

__version__ = "0.1.0"
