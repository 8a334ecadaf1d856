"""Engine operators beyond plain relational composition.

- ``dedup``      — exact, keyed, MinHash-LSH, SimHash, n-gram Jaccard
- ``similarity`` — exact cosine top-k / self-join, IVF approximate ANN
- ``text``       — tokenization, stats, language-ID, quality, fingerprints
- ``multimodal`` — opaque binary payload columns + metadata extraction

Everything is deterministic by construction (seeded hash families via
xxhash64, no RNG) so results are stable across runs, partitionings and
cluster sizes — a hard requirement for both the driver's oracle and
reproducible 100 TB pipelines.
"""
