"""Deterministic sampling, splitting and chunking for training-data
pipelines.

Sampling uses content-hash thresholds (md5 of the key), NOT
rand()/sampleBy: the sample is then a pure function of the key —
identical on any cluster size, stable across reruns, and expressible
in plain SQL for the oracle.  This is how reproducible train/val/test
membership is done at 100 TB (resampling a shard never flips another
shard's rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def _hash01(key: Column) -> Column:
    """Uniform-ish [0,1) from the first 8 hex chars of md5(key) —
    deterministic and SQL-portable (same construction in DuckDB)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / float(1 << 32)


def hash_sample(
    df: DataFrame, key: str, fraction: float
) -> DataFrame:
    """Keep ~fraction of rows, membership decided by md5(key)."""
    return df.withColumn("_u", _hash01(F.col(key))).filter(
        F.col("_u") < fraction
    ).drop("_u")


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the downsample-dominant-
    language / upweight-rare-source step of corpus mixing): each
    stratum keeps its own hash fraction of rows.  Same content-hash
    membership as ``hash_sample`` — a pure per-row predicate, no
    shuffle, no rand(), resampling one stratum never flips another's
    rows."""
    frac = None
    for value, f in fractions.items():
        frac = (
            F.when(F.col(strata_col) == value, F.lit(f))
            if frac is None
            else frac.when(F.col(strata_col) == value, F.lit(f))
        )
    frac = F.lit(default_frac) if frac is None else frac.otherwise(
        F.lit(default_frac)
    )
    return df.filter(_hash01(F.col(key)) < frac)


def train_eval_split(
    df: DataFrame, key: str, eval_frac: float = 0.1, test_frac: float = 0.1
) -> DataFrame:
    """Assign a stable split label per key: test / eval / train by
    disjoint hash ranges."""
    u = _hash01(F.col(key))
    split = (
        F.when(u < test_frac, "test")
        .when(u < test_frac + eval_frac, "eval")
        .otherwise("train")
    )
    return df.withColumn("split", split)


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 50, overlap: int = 0
) -> DataFrame:
    """Split each document into fixed-size token chunks (the
    sequence-prep step before packing/tokenization): one output row
    per (doc_id, chunk_id) with the chunk text and its token count.
    Pure explode — no shuffle, output rows ~ total_tokens/stride.

    ``overlap`` tokens are shared between consecutive chunks (chunk i
    starts at ``i * (chunk_tokens - overlap)``) — the sliding-window
    variant RAG indexing and context-boundary-sensitive training prep
    use so no span is ever split across chunks without a chunk that
    contains it whole."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    toked = docs.select(
        "doc_id", "lang", tokens(F.col("text")).alias("toks")
    )
    n_chunks = F.ceil(F.size("toks") / F.lit(stride)).cast("int")
    chunked = toked.select(
        "doc_id",
        "lang",
        F.col("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return chunked.select(
        "doc_id",
        "lang",
        "chunk_id",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("chunk_tokens"),
    )


def pack_chunks(
    chunks: DataFrame, budget: int = 256, n_buckets: int = 8
) -> DataFrame:
    """Sequence packing: assign token chunks to fixed-budget training
    bins (the pack-before-tokenize step that turns ragged documents
    into dense batches).  Greedy-by-position: within a bucket, chunks
    in (doc_id, chunk_id) order go to bin ``floor(tokens_before /
    budget)`` — a bin may overflow by at most one chunk (bounded by
    the chunk size), the price of making packing a pure window cumsum
    instead of sequential driver state.

    True greedy packing is order-sequential and unparallelizable;
    bucketing by doc hash makes each bucket an independent window
    partition (one shuffle, N parallel packers, at most one
    partially-filled bin per bucket).  At 100 TB raise ``n_buckets``
    to the write parallelism you want — determinism is unaffected
    since bucket and order are pure key functions."""
    b = chunks.withColumn(
        "bucket", (F.col("doc_id") % n_buckets).cast("int")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    before = F.sum("chunk_tokens").over(w) - F.col("chunk_tokens")
    return b.select(
        "bucket",
        "doc_id",
        "chunk_id",
        "chunk_tokens",
        F.floor(before / budget).cast("int").alias("bin_id"),
    )


def per_group_cap(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """Deterministic per-group downsample cap: keep at most ``k`` rows
    per group, chosen by hash rank of the unique key (NOT first-k by
    storage order, which is nondeterministic and position-biased, and
    NOT rand(), which is irreproducible).  The per-source cap every
    corpus-mixing recipe needs; same rows on any cluster size or
    partitioning.  One shuffle on the group key; Spark inserts
    WindowGroupLimit so each mapper pre-trims to k before the
    exchange."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.xxhash64(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_hr", F.row_number().over(w))
        .filter(F.col("_hr") <= k)
        .drop("_hr")
    )


def temperature_mix(
    df: DataFrame,
    key: str,
    source_col: str,
    alpha: float = 0.5,
    max_repeat: int = 4,
) -> DataFrame:
    """Temperature-weighted corpus mixing: resample so source ``s``
    with natural share ``p_s`` contributes ~``p_s**alpha`` of the
    mix (alpha=1 keeps natural proportions, alpha=0 equalizes
    sources; alpha≈0.3-0.7 is the published LLM-corpus range).  The
    per-row keep/repeat rate is ``r_s = (p_s / p_max)**(alpha - 1)``
    — 1.0 for the LARGEST source, >1 (upsampled by repetition) for
    rarer ones, capped at ``max_repeat`` so a tiny source can't
    explode the output.

    Each input row emits ``floor(r_s)`` guaranteed copies plus one
    more with probability ``frac(r_s)``, decided by the same
    md5-of-key construction as ``hash_sample`` (salted with the copy
    index) — fully deterministic, SQL-portable, no rand().  Output
    carries an ``epoch`` column (0-based copy index) so downstream
    packing can interleave repeats instead of clustering them.

    Plan shape: one source-count aggregate (rows = #sources,
    broadcast back) + a per-row explode — the big side shuffles
    ZERO times and nothing reaches the driver (``p_s / p_max``
    reduces to ``n_s / n_max``, so the corpus total is never
    needed).  Rates are rounded to 6 dp before the hash compare so
    the Spark and oracle pow() agree bit-for-bit."""
    counts = df.groupBy(source_col).count()
    nmax = counts.agg(F.max("count").alias("_nmax"))
    rate = F.round(
        F.pow(F.col("count") / F.col("_nmax"), F.lit(alpha - 1.0)), 6
    )
    rates = counts.crossJoin(F.broadcast(nmax)).select(
        source_col,
        F.least(rate, F.lit(float(max_repeat))).alias("_rate"),
    )
    out = df.join(F.broadcast(rates), source_col).withColumn(
        "epoch",
        F.explode(F.sequence(F.lit(0), F.ceil(F.col("_rate")).cast("int") - 1)),
    )
    # copy `epoch` survives iff epoch < floor(rate) (guaranteed) or
    # the salted hash falls under the fractional remainder
    u = _hash01(
        F.concat(
            F.col(key).cast("string"), F.lit(":"), F.col("epoch").cast("string")
        )
    )
    return out.filter(
        (F.col("epoch") < F.floor("_rate"))
        | (u < F.col("_rate") - F.floor("_rate"))
    ).drop("_rate")
