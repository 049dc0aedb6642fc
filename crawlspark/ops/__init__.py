"""Large-scale training-data-pipeline operators (build brief §ops):
deduplication (exact / minhash-LSH / n-gram Jaccard / simhash /
embedding cosine), similarity search (brute-force + LSH-bucketed
ANN), text analysis (token stats, quality, language-ID,
fingerprinting), and multimodal (image decode/feature) operators —
all DataFrame-first, Arrow-batched where Python is unavoidable.
"""
