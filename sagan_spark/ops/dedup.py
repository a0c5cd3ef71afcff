"""Deduplication operators for training-data pipelines at 100 TB scale.

- exact_dedup: hash-groupBy on a fingerprint — ONE shuffle on the hash,
  map-side partial aggregation; survivor = min(id).
- minhash signatures: portable construction so SQL oracles can replicate:
  shingles = w-word windows; hash h_i(s) = md5(i || ':' || shingle) taken
  as the first 16 hex chars (64-bit, compared lexicographically — order
  is identical to numeric on the hex prefix). Signature = per-seed min.
- LSH candidate pairs: band the signature, shuffle on (band_idx,
  band_hash), pair within buckets — candidate generation cost is
  O(sum over buckets |bucket|²) instead of O(n²); at 10^9 docs this is
  the only feasible shape, and the bucket join is a plain groupBy.
- simhash64: 64-bit sign-aggregated token hashes via xxhash64; near-dup
  when hamming distance small (popcount via bit ops).
- ngram_jaccard: exact Jaccard on token n-gram sets for a candidate pair
  set (used to verify LSH candidates; explode + groupBy, no UDF).

Spark-first: everything below is Column expressions + explode/groupBy;
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Survivor row ids: min(id) per md5(text). Columns: (fp, doc_id)."""
    fp = F.md5(F.encode(F.col(text_col), "utf-8")).alias("fp")
    return df.select(fp, F.col(id_col)).groupBy("fp").agg(F.min(id_col).alias(id_col))


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", w: int = 3) -> DataFrame:
    """Distinct w-word shingles per doc: (id, shingle). Pure SQL HOFs:
    tokens → transform over sliding offsets → filter full windows."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(toks)
    idxs = F.sequence(F.lit(0), F.greatest(n - F.lit(w), F.lit(0)))
    sh = F.transform(
        idxs,
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, w)),
    )
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
        .where(F.length("shingle") > 0)
    )


def minhash_signature(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """(id, sig array<string>): per-seed min of md5-based shingle hashes.

    Portable: md5(seed || ':' || shingle) first 16 hex chars; min() is a
    plain groupBy aggregate — map-side combine keeps the shuffle tiny.
    """
    aggs = [
        F.min(F.substring(F.md5(F.encode(F.concat(F.lit(f"{i}:"), F.col("shingle")), "utf-8")), 1, 16)).alias(
            f"h{i}"
        )
        for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing at least one LSH band.

    Shuffle key = (band_idx, band_hash); self-join happens per bucket.

    ``max_bucket`` caps the per-bucket pair blow-up: a degenerate bucket
    (empty/boilerplate docs all sharing one band hash) costs O(|bucket|²)
    pairs — at 10^9 docs a single 10^6-doc bucket alone is 10^12 pairs.
    Buckets larger than the cap are DROPPED from candidate generation
    (their members are near-identical boilerplate, which exact dedup
    already collapses); use lsh_bucket_stats to surface how many buckets/
    docs a given cap drops instead of silently truncating. None = uncapped.
    """
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.concat_ws("|", F.slice("sig", b * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band_idx", "band_hash"),
    )
    if max_bucket is not None:
        # bucket size via a WINDOW over the self-join's own shuffle key —
        # one Exchange + Sort, no second aggregate-and-join. Measured at
        # sf0.1 (min-of-3, local[32]): uncapped 3.5s, groupBy+join cap
        # 4.5s (+26%), this window cap 3.9s (+9%); identical pair sets.
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_hash")
        banded = (
            banded.withColumn("_bucket_n", F.count("*").over(w))
            .where(F.col("_bucket_n") <= max_bucket)
            .drop("_bucket_n")
        )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


def lsh_bucket_stats(
    sig: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Observability for the bucket cap: one row with total buckets,
    over-cap (dropped) buckets, and docs touching a dropped bucket —
    the 'no silent caps' companion to lsh_candidate_pairs."""
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.concat_ws("|", F.slice("sig", b * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band_idx", "band_hash"),
    )
    cap = F.lit(max_bucket if max_bucket is not None else (1 << 62))
    per_bucket = banded.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("n"), F.countDistinct(id_col).alias("docs")
    )
    return per_bucket.agg(
        F.count("*").alias("buckets"),
        F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).cast("long").alias("dropped_buckets"),
        F.sum(F.when(F.col("n") > cap, F.col("docs")).otherwise(0)).cast("long").alias(
            "docs_in_dropped"
        ),
    )


def dedup_clusters(
    pairs: DataFrame, a: str = "a", b: str = "b", max_iters: int = 20
) -> DataFrame:
    """Duplicate GROUPS from candidate pairs: connected components, each
    node labeled with the min doc id of its component — the final step of
    the dedup chain (exact/LSH/cosine pairs → clusters → keep one survivor
    per cluster). Returns (doc_id, cluster).

    Algorithm: iterative min-label propagation — each round every node
    takes min(own label, neighbors' labels) via ONE join + ONE groupBy on
    the undirected edge list; stop when no label changes (checked with a
    count on the same pass). Rounds needed = component diameter, which for
    near-dup clusters is tiny (boilerplate families are dense, quasi-
    cliques). 100 TB shape: each round is a self-contained shuffle pair on
    the node id; lineage is truncated per round (localCheckpoint) so the
    plan stays O(1) deep instead of O(iters); the driver sees only a
    one-row convergence count per round. For adversarial long-chain graphs
    switch to large-star/small-star contraction (O(log n) rounds, same
    join primitives) — not needed for dedup workloads.

    Output columns are always (``doc_id``, ``cluster``) regardless of the
    input pair column names (dedup_survivors relies on that contract).
    Raises after ``max_iters`` non-converged rounds (loud beats silently
    wrong clusters).
    """
    from pyspark import StorageLevel

    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
        .localCheckpoint()
    )
    prev = None  # previous round's materialized labels, dropped each round
    try:
        for i in range(max_iters):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src")
                .agg(F.min("cluster").alias("nmin"))
            )
            merged = (
                labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
                .select(
                    "node",
                    "cluster",
                    F.least(F.col("cluster"), F.coalesce("nmin", F.col("cluster"))).alias(
                        "new_cluster"
                    ),
                )
            )
            # Storage stays bounded at ~2 label-set copies: each round is
            # materialized (persist + count — the count also decides
            # convergence from the cached blocks), and the PREVIOUS round
            # is explicitly unpersisted once the new one exists. Every 5th
            # round a localCheckpoint replaces the persist to truncate
            # lineage (analysis cost stays O(1) instead of O(iters));
            # dropped checkpoint blocks are reclaimed by the ContextCleaner
            # once `prev` stops referencing them.
            if (i + 1) % 5 == 0:
                merged = merged.localCheckpoint()
            else:
                merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
            changed = merged.where(F.col("cluster") != F.col("new_cluster")).count()
            if prev is not None:
                prev.unpersist()
            prev = merged
            labels = merged.select("node", F.col("new_cluster").alias("cluster"))
            if changed == 0:
                out = labels.select(
                    F.col("node").alias("doc_id"), "cluster"
                ).localCheckpoint()
                return out
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iters} rounds — "
            "component diameter exceeds the dedup assumption; use star "
            "contraction for this graph"
        )
    finally:
        edges.unpersist()
        if prev is not None:
            prev.unpersist()


def dedup_survivors(
    df: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per duplicate cluster (min id — matching exact_dedup's
    survivor rule); rows in no cluster pass through. ``clusters`` is
    dedup_clusters output and always has columns (doc_id, cluster);
    ``id_col`` names the id column of ``df`` only. Anti-join on the
    non-survivor set: only duplicate ids shuffle, the corpus doesn't."""
    losers = clusters.where(F.col("doc_id") != F.col("cluster")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def dedup_survivors_ranked(
    df: DataFrame,
    clusters: DataFrame,
    order_col: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-ranked survivor selection: keep the cluster member that
    maximizes ``order_col`` (e.g. ops/text.quality_score — a curation
    pipeline keeps the best-written duplicate, not the lowest id;
    deterministic id tiebreak). Rows in no cluster pass through.

    Shape at scale: only the clustered slice (duplicates, a small fraction
    of the corpus) joins and takes the per-cluster window; the corpus
    itself only anti-joins the loser-id set — same discipline as
    dedup_survivors."""
    from pyspark.sql import Window

    members = df.select(F.col(id_col), order_col.alias("_rank")).join(
        clusters.withColumnRenamed("doc_id", id_col), on=id_col
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("_rank").desc(), F.col(id_col).asc()
    )
    losers = (
        members.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > 1)
        .select(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def ngram_jaccard(
    sh: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard for candidate pairs: (a, b, jaccard).

    |A∩B| from a join of shingle sets restricted to candidate pairs;
    |A∪B| = |A|+|B|−|A∩B|. Set sizes broadcast back via two joins.
    """
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    sha = sh.select(F.col(id_col).alias("a"), "shingle")
    shb = sh.select(F.col(id_col).alias("b"), F.col("shingle").alias("shingle_b"))
    inter = (
        pairs.join(sha, on="a")
        .join(shb, on="b")
        .where(F.col("shingle") == F.col("shingle_b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "a").withColumnRenamed("sz", "sza"), on="a")
        .join(sizes.withColumnRenamed(id_col, "b").withColumnRenamed("sz", "szb"), on="b")
        .select(
            "a",
            "b",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 4).alias(
                "jaccard"
            ),
        )
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.25,
    nbits: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cos) with cos ≥
    ``threshold``, candidates restricted to pairs sharing a random-
    hyperplane LSH bucket (sign signature over ``nbits`` seeded planes).

    Scale shape: bucket key = the packed signature, so candidate
    generation is a self-equi-join on the bucket (same discipline as the
    MinHash LSH path — never all-pairs; expected bucket size n/2^nbits).
    Exact cosine re-check inside the bucket keeps precision exact;
    recall is the LSH trade documented in ops/similarity. ``threshold``
    and ``nbits`` tune the precision/recall/bucket-size triangle: near-dup
    vectors (cos → 1) collide in almost every bucket, so real corpora use
    nbits 16-24 at 10^9 vectors."""
    from .similarity import _hyperplanes, cosine, lsh_signature

    if dim is None:
        # dim inference costs one eager first() job — pass dim explicitly
        # in pipelines that know their embedding width
        row = emb.select(vec_col).first()
        if row is None:  # empty corpus → empty pair set, correct schema
            return emb.sparkSession.createDataFrame(
                [], "a long, b long, cos double"
            )
        dim = len(row[0])
    planes = _hyperplanes(dim, nbits)
    sig = emb.select(
        F.col(id_col), F.col(vec_col), lsh_signature(F.col(vec_col), planes).alias("_sig")
    )
    left = sig.alias("l")
    right = sig.alias("r")
    cos = cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
    return (
        left.join(
            right,
            (F.col("l._sig") == F.col("r._sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .where(cos >= F.lit(float(threshold)))
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.round(cos, 6).alias("cos"),
        )
    )


def simhash_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Cross-engine-reproducible SimHash variant: token hash = first 8 hex
    chars of md5(token) as int; bit b of the fingerprint = majority vote of
    token-hash bit b. ``bits`` kept small so the SQL oracle (one aggregate
    per bit) stays readable. Same shuffle shape as simhash64."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    ).where(F.length("tok") > 0)
    h = toks.select(
        id_col, F.conv(F.substring(F.md5(F.encode(F.col("tok"), "utf-8")), 1, 8), 16, 10).cast("long").alias("h")
    )
    bit_sums = h.groupBy(id_col).agg(
        F.count("*").alias("n"),
        *[F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"b{b}") for b in range(bits)],
    )
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{b}") * 2 > F.col("n"), F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bit_sums.select(F.col(id_col), sim.alias("simhash"))


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc from whitespace tokens: (id, simhash).

    Each bit b of xxhash64(token) votes ±1; simhash bit = majority.
    Implemented as explode→groupBy with bit-arithmetic aggregates
    (sum of extracted bits vs token count) — no UDF, two narrow shuffles.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    ).where(F.length("tok") > 0)
    h = toks.select(id_col, F.xxhash64("tok").alias("h"))
    bit_sums = h.groupBy(id_col).agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(64)
        ],
    )
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{b}") * 2 > F.col("n"), F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bit_sums.select(F.col(id_col), sim.alias("simhash"))


def hamming64(a, b):
    """Population count of XOR — Spark has bit_count since 3.3."""
    return F.bit_count(a.bitwiseXOR(b))
