"""Training-data pipeline operations — first-class components beyond the
reference's transform set (the operations a 100 TB training-data pipeline
needs): deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
embedding similarity search, text analysis (language-ID, quality scoring,
token counting, fingerprinting), and multimodal binary-column plumbing.

All hot paths are JVM column expressions (hash-based sketches use md5 hex
strings so results are bit-identical across engines — the correctness
oracle recomputes them in DuckDB); Python appears only in clearly-marked
vectorized pandas UDFs.
"""

from vector_spark.dataprep import dedup, similarity, text  # noqa: F401
