"""Training-data pipeline operators: splits, packing, decontamination,
stratified sampling, incremental dedup.

These are corpus-preparation steps a large-scale LLM data pipeline runs
between raw ingestion and tokenization (beyond the reference's surface;
driver north star). Every operator is deterministic — splits and
samples are hash-based (md5, the cross-engine primitive), orderings are
fully tie-broken — so each has an exact DuckDB oracle in
queries/datapipe.py.

Scale notes inline per operator; none of them shuffles more than once
per logical step, and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.operators.dedup import content_hash64

# Packing shards: a deterministic "packer id" that bounds every window
# to one shard, so the running sum never needs a global sort. 32 shards
# at test scale; at 100 TB this would be O(cluster cores).
PACK_SHARDS = 32
# Context-window capacity in whitespace tokens (small enough that the
# ~25-token testdata docs produce multi-doc bins worth checking).
PACK_CAPACITY = 64
# Hash-split bucket space; cut points are percentages of it.
SPLIT_BUCKETS = 100


def hash_bucket(col, buckets: int = SPLIT_BUCKETS):
    """Deterministic bucket in [0, buckets): md5-derived 60-bit int mod
    buckets. Stable across engines, runs, partitionings — the property
    a train/val/test split must have so re-runs never leak documents
    across splits."""
    return content_hash64(col.cast("string")) % buckets


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    cuts: tuple[tuple[int, str], ...] = ((90, "train"), (95, "val"), (100, "test")),
) -> DataFrame:
    """Assign every row to a named split by hash bucket of its id.

    One narrow projection — no shuffle at all; the split column is
    computable inside the scan at any scale. ``cuts`` are cumulative
    upper bounds over the bucket space (90/95/100 → 90% / 5% / 5%);
    the final bound must cover the whole bucket space, otherwise rows
    hashing past it would silently get a NULL split.
    """
    bounds = [bound for bound, _ in cuts]
    if not bounds:
        raise ValueError("split cuts must not be empty")
    if bounds != sorted(bounds) or len(set(bounds)) != len(bounds):
        raise ValueError(f"split cuts must strictly increase, got {bounds}")
    if bounds[-1] != SPLIT_BUCKETS:
        raise ValueError(
            f"final split cut must equal the bucket space {SPLIT_BUCKETS}, "
            f"got {bounds[-1]} — rows past it would get a NULL split"
        )
    bucket = hash_bucket(F.col(id_col))
    expr = None
    for bound, name in cuts:
        cond = bucket < bound
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("bucket", bucket).withColumn("split", expr)


def pack_contiguous(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    capacity: int = PACK_CAPACITY,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """Contiguous-fill sequence packing: documents are sharded by a
    deterministic hash of their id, ordered within the shard, and
    assigned to fixed-capacity bins by their running token count
    (bin = cumulative-tokens-before ÷ capacity).

    This is the distributed form of greedy context-window packing: each
    shard packs independently (window partitioned by shard — no global
    sort, shards scale with the cluster), bins are globally unique via
    ``(shard << 40) | local_bin`` — 2^40 local bins per shard (~70
    trillion tokens at the default capacity) before ids could collide
    across shards, comfortably past a 100 TB corpus even with few
    shards. Contiguous fill admits one straddling document per bin
    boundary — the standard trade accepted at scale, where a perfect
    bin-packing pass would serialize the corpus.
    """
    shard = (content_hash64(F.col(id_col).cast("string")) % shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        df.withColumn("shard", shard)
        .withColumn("cum_before", cum_before)
        .withColumn(
            "bin_id",
            (
                F.shiftleft(F.col("shard").cast("bigint"), 40)
                + F.floor(F.col("cum_before") / capacity)
            ).cast("bigint"),
        )
        .withColumn(
            "bin_pos", (F.col("cum_before") % capacity).cast("bigint")
        )
        .drop("cum_before")
    )


# Retrieval chunking: fixed-token windows with overlap. 16-token
# chunks with 4-token overlap (stride 12) are small enough that the
# ~25-token testdata docs produce multi-chunk outputs worth checking.
CHUNK_SIZE = 16
CHUNK_OVERLAP = 4


def chunk_fixed_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Fixed-token retrieval chunking with overlap and provenance —
    the retrieval-side twin of :func:`pack_contiguous` (pack merges
    short docs into context windows; chunk splits long docs into
    retrieval units). Each chunk row carries full provenance:
    ``(doc_id, chunk_idx, tok_start, tok_end, char_start, char_end,
    n_chunk_tokens)`` where the char span indexes the original text
    (single-space whitespace tokenization, the corpus-wide token
    convention).

    Chunk starts sit at multiples of ``stride = size - overlap``; a
    trailing start is emitted only if it contributes at least one
    token beyond the previous chunk's coverage (``start == 0 OR
    start < n_toks - overlap``), so no chunk is fully contained in
    its predecessor.

    Plan (the pack_contiguous running-sum discipline, per-doc instead
    of per-shard): posexplode tokens → ONE shuffle partitioned by doc,
    over which four window expressions share the exchange and sort —
    running char offset (sum over preceding), token count, a
    ``lead(size-1)`` that reads the char end of a full chunk directly
    from the token stream, and a partition max for the truncated
    trailing chunk. No join at all: an earlier join-based formulation
    broadcast the full token-row relation (corpus-sized — fine at test
    scale, fatal at 100 TB); the lead/max form keeps everything inside
    one linear window pass. No global sort, no collect; docs chunk
    independently at any corpus size.
    """
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < chunk size {size}")
    stride = size - overlap
    toks = df.select(
        id_col,
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
            "pos", "tok"
        ),
    )
    w_doc = Window.partitionBy(id_col)
    w_ord = w_doc.orderBy("pos")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    cend = F.coalesce(
        F.sum(F.length("tok") + 1).over(w_run), F.lit(0)
    ) + F.length("tok")
    tok_rows = toks.select(
        id_col,
        "pos",
        F.coalesce(F.sum(F.length("tok") + 1).over(w_run), F.lit(0)).alias(
            "char_start"
        ),
        F.count("*").over(w_doc).alias("n_toks"),
        # char end of the chunk STARTING here: the cend of the token
        # size-1 positions ahead (full chunk), else the doc's last
        # token's cend (truncated trailing chunk)
        F.coalesce(
            F.lead(cend, size - 1).over(w_ord), F.max(cend).over(w_doc)
        ).alias("char_end"),
    )
    return tok_rows.filter(
        (F.col("pos") % stride == 0)
        & ((F.col("pos") == 0) | (F.col("pos") < F.col("n_toks") - overlap))
    ).select(
        id_col,
        F.expr(f"pos DIV {stride}").cast("bigint").alias("chunk_idx"),
        F.col("pos").cast("bigint").alias("tok_start"),
        (F.least(F.col("pos") + size, F.col("n_toks")) - 1)
        .cast("bigint")
        .alias("tok_end"),
        F.col("char_start").cast("bigint").alias("char_start"),
        F.col("char_end").cast("bigint").alias("char_end"),
        (F.least(F.col("pos") + size, F.col("n_toks")) - F.col("pos"))
        .cast("bigint")
        .alias("n_chunk_tokens"),
    )


def ngram_overlap(
    candidates: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingle",
) -> DataFrame:
    """Per-candidate count of distinct shingles shared with a benchmark
    corpus — the decontamination primitive (drop or flag training docs
    that overlap an eval set).

    Plan: distinct benchmark shingles (small: eval sets are thousands
    of docs) are joined to candidate shingles on the shingle value —
    broadcastable in the common case — then one hash aggregate per
    candidate. Never doc×doc; work scales with shingle matches.
    """
    bench = benchmark.select(shingle_col).distinct()
    return (
        candidates.join(bench, shingle_col)
        .groupBy(id_col)
        .agg(F.countDistinct(shingle_col).alias("n_shared"))
    )


# Decontamination decision thresholds on the shared-shingle fraction:
# at/above DROP the doc is removed from training outright; between FLAG
# and DROP it is kept but flagged for audit; below FLAG it is clean.
DECONTAM_DROP_AT = 0.5
DECONTAM_FLAG_AT = 0.1


def decontaminate(
    candidates: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingle",
    drop_at: float = DECONTAM_DROP_AT,
    flag_at: float = DECONTAM_FLAG_AT,
) -> DataFrame:
    """Thresholded decontamination decision over :func:`ngram_overlap`
    counts — the policy layer that turns "N shingles shared with the
    eval set" into drop / flag / keep, with the audit columns
    (per-doc shingle total, shared count, overlap fraction) carried in
    the output so the report IS the result.

    Plan: one aggregate for per-doc totals, the ngram_overlap
    equi-join+aggregate for shared counts, then a join on the doc id —
    each step one shuffle on a key that's unique per doc, never doc×doc.
    The fraction is an int÷int double division, bit-identical across
    engines, so the decision thresholds are oracle-exact.
    """
    totals = candidates.groupBy(id_col).agg(
        F.countDistinct(shingle_col).alias("n_shingles")
    )
    shared = ngram_overlap(candidates, benchmark, id_col, shingle_col)
    n_shared = F.coalesce(F.col("n_shared"), F.lit(0))
    frac = n_shared.cast("double") / F.col("n_shingles").cast("double")
    return totals.join(shared, id_col, "left").select(
        id_col,
        "n_shingles",
        n_shared.alias("n_shared"),
        frac.alias("overlap_frac"),
        F.when(frac >= drop_at, "drop")
        .when(frac >= flag_at, "flag")
        .otherwise("keep")
        .alias("decision"),
    )


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Deterministic k-per-stratum sample: within each stratum, rank
    rows by (md5-hash of id, id) and keep the first k. The hash makes
    the sample pseudorandom w.r.t. any natural ordering; the id
    tie-break makes it exact. One shuffle on the stratum key.

    At 100 TB strata can be huge, but rank≤k needs only a bounded
    per-partition heap (WindowGroupLimit pushes the k-limit below the
    sort), so no stratum ever materializes fully sorted.
    """
    h = hash_bucket(F.col(id_col), 1_000_000_007)
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def incremental_new(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup: rows of ``batch`` whose content hash
    does not already exist in ``corpus`` — the daily-ingest shape where
    the corpus is petabytes and the batch is small.

    Anti-join on the content hash: one shuffle keyed on the hash (or a
    broadcast of the batch side at real scale). The corpus side prunes
    to its hash column only — column pruning keeps the big scan narrow.
    """
    ch = F.md5(F.col(text_col)).alias("content_hash")
    seen = corpus.select(ch).distinct()
    return (
        batch.withColumn("content_hash", F.md5(F.col(text_col)))
        .join(seen, "content_hash", "left_anti")
    )


# Corpus-mixing bucket space and the pinned language rebalance rates:
# the dominant language (en, ~50% of the synthetic corpus) is
# downsampled while the rest pass through — the standard "temperature"
# rebalance a multilingual training mix applies before tokenization.
MIX_BUCKETS = 10_000
MIX_RATES: dict[str, float] = {
    "en": 0.4,
    "fr": 1.0,
    "de": 1.0,
    "es": 1.0,
    "zh": 1.0,
}


def mix_sample(
    df: DataFrame,
    rates: dict[str, float] | None = None,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus-mixing sampler: keep a row iff the md5
    bucket of its id falls under its group's rate — per-group Bernoulli
    sampling that is exact, reproducible, and engine-independent
    (re-runs and backfills select the same documents).

    Zero shuffle: the keep decision is a projection computable inside
    the scan, so rebalancing a 100 TB corpus is scan-bound. Groups
    absent from ``rates`` pass through at rate 1.0 — mixing must never
    silently drop an unlisted source.
    """
    rates = MIX_RATES if rates is None else rates
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"mix rate for {g!r} must be in [0, 1], got {r}")
    bucket = hash_bucket(F.col(id_col), MIX_BUCKETS)
    thresh = None
    for g, r in sorted(rates.items()):
        lim = F.lit(int(r * MIX_BUCKETS))
        cond = F.col(group_col) == g
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    # empty rates → every group passes through at rate 1.0
    thresh = (
        F.lit(MIX_BUCKETS) if thresh is None else thresh.otherwise(F.lit(MIX_BUCKETS))
    )
    return (
        df.withColumn("mix_bucket", bucket)
        .withColumn("keep_under", thresh)
        .filter(F.col("mix_bucket") < F.col("keep_under"))
    )
