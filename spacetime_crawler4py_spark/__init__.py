"""spacetime_crawler4py_spark — a PySpark-native frontier/fetch/parse
engine with the query and data-processing capabilities of the
reference crawler + indexer (BirdmasterLance/spacetime-crawler4py).

Architecture (Spark-first, not a port):

- ``functions/``  scalar transforms: URL normalize/hash/defragment,
  validity predicates, tokenizers, simhash, text-quality metrics.
  Each ships BOTH a pure-Python oracle (reference-parity semantics)
  and a Spark expression / vectorized pandas UDF.
- ``operators/``  DataFrame-level operators: HTML page parsing
  (mapInPandas), dedup family (exact / minhash-LSH / simhash /
  n-gram Jaccard / embedding-cosine), similarity search, multimodal
  column plumbing.
- ``frontier/``   snapshot-committed URL frontier table (Iceberg-shaped
  parquet store), broadcast bloom seen-set, politeness scheduler.
- ``crawl/``      micro-batch crawl driver loop + single-threaded
  pure-Python oracle crawler for golden tests.
- ``analytics/``  the reference's four report analytics as Spark SQL.
- ``indexing/``   inverted index, TF-IDF, search.
- ``datagen/``    deterministic synthetic page-graph generator.
"""

__version__ = "0.1.0"
