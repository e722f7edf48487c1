"""Training-data pipeline operators over document/embedding/image tables.

These are the large-scale data-curation operations a 100 TB crawl corpus
needs downstream of the frontier engine: dedup (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding near-dup), similarity search, text analysis, and
multimodal column plumbing. All Spark-built-in-first; pandas UDFs only where
the math genuinely needs numpy.
"""
