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

from pyspark.sql import DataFrame


def checkpoint_release(out: DataFrame, caches: list[DataFrame]) -> DataFrame:
    """The pins-protocol epilogue for a DIRECT (pin-less) operator
    call: eagerly materialize the result (localCheckpoint —
    result-sized) and release the operator's whole-corpus caches in
    ``finally`` so a failed materialization can't leak them for the
    session (ADVICE r7).  Callers that pass a ``pins`` list skip this
    and own the cache lifetime (queries release via _release_after)."""
    try:
        return out.localCheckpoint(eager=True)
    finally:
        for c in caches:
            c.unpersist()
