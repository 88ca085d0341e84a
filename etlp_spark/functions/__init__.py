"""Large-scale training-data operators (BASELINE.json north star).

Beyond the reference's surface: deduplication (exact, MinHash-LSH,
SimHash), similarity search over embeddings, text analysis
(language-ID, quality scoring, token counting, fingerprinting), and
multimodal column plumbing. Everything is Column-expression-first so
it runs JVM-side at 100 TB; Python appears only in clearly-marked
Pandas-UDF escape hatches.
"""
