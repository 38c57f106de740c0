"""Large-scale training-data pipeline operations, expressed as vectorized
Ray Data stages: deduplication (exact / MinHash-LSH / SimHash), similarity
search, and text analysis.  All kernels are numpy/arrow array-at-a-time."""
