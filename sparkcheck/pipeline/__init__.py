"""Training-data pipeline operators beyond the reference's validation surface:
deduplication (exact / fingerprint / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search (brute-force cosine + IVF-bucketed), text analysis
(token counts, quality scores, language-ID heuristic), and multimodal binary
columns (audio — sparkcheck.metrics.audio). All native Spark SQL expressions;
hashes are md5-based so results are engine-portable (oracle-checkable)."""
