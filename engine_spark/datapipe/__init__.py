"""LLM-training-data pipeline operators over the ``documents`` and
``embeddings`` tables: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine), similarity search (brute-force and
LSH-bucketed ANN), text analysis (language-ID, quality scoring, token
counting, fingerprinting), and multimodal binary-column plumbing.

Not present in the reference engine (it is a CEP engine); required by the
rebuild brief as first-class operators designed for 100 TB scale:

- every per-document computation is **row-local** (map-only, no shuffle):
  tokenization, shingling, MinHash signatures, SimHash, fingerprints all
  compile to Catalyst array expressions — no Python UDFs anywhere;
- candidate generation is always **bucketed** (LSH bands / shared-shingle
  inverted index / hyperplane buckets), never an all-pairs cross join;
- the only shuffles are the bucket-key exchanges and the final
  verify joins over the (small) candidate pair set.

Cross-engine determinism: every computed column is defined ONCE as a
dialect-templated SQL fragment (``fragments.py``) and rendered for both
Spark and DuckDB, so the driver's value-hash gate passes by construction.
"""
