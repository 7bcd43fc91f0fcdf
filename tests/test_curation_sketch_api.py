"""Library API (ext/curation.py, ext/sketches.py) equals the verified
suite entries when parameterized identically — the suite's oracle
evidence transfers to the reusable column-parameterized surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketing_etl_analytics_spark.suite import SUITE

SF_DIR = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_chunk_documents_matches_suite(spark):
    from marketing_etl_analytics_spark.ext import chunk_documents

    lib = chunk_documents(_docs(spark)).select(
        "doc_id", "chunk_ord", "n_chunk_tokens", "chunk_hash"
    )
    # graded via the ext_chunk_balance merged row since r7; the single
    # stays callable and must keep matching the library path
    from marketing_etl_analytics_spark.suite.ext_pipeline import (
        ext_chunk_documents,
    )

    suite = ext_chunk_documents(spark, SF_DIR)
    cols = ["doc_id", "chunk_ord", "n_chunk_tokens", "chunk_hash"]
    assert _rows(lib, cols) == _rows(suite, cols)
    # chunk_text round-trips: hash of the text column is the hash column
    bad = chunk_documents(_docs(spark)).filter(
        F.md5("chunk_text") != F.col("chunk_hash")
    )
    assert bad.count() == 0


def test_domain_balance_matches_suite(spark):
    from marketing_etl_analytics_spark.ext import domain_balance

    lib = domain_balance(_docs(spark)).withColumnRenamed("lang", "stratum")
    # graded via the ext_chunk_balance merged row since r7
    from marketing_etl_analytics_spark.suite.ext_pipeline import (
        ext_domain_balance,
    )

    suite = ext_domain_balance(spark, SF_DIR)
    cols = ["doc_id", "stratum", "sample_rank"]
    assert _rows(lib, cols) == _rows(suite, cols)


def test_temperature_sample_matches_suite(spark):
    # graded via the ext_sampling_suite merged row since r5; the
    # single stays callable and must keep matching the library path
    from marketing_etl_analytics_spark.ext import temperature_sample
    from marketing_etl_analytics_spark.suite.ext_pipeline import (
        ext_sample_temperature,
    )

    lib = temperature_sample(_docs(spark)).select(
        "doc_id", F.col("lang").alias("stratum")
    )
    suite = ext_sample_temperature(spark, SF_DIR)
    cols = ["doc_id", "stratum"]
    assert _rows(lib, cols) == _rows(suite.select(*cols), cols)


def test_semantic_dedup_matches_suite(spark):
    from marketing_etl_analytics_spark.ext import semantic_dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    lib = semantic_dedup(emb)
    suite = SUITE["ext_semantic_dedup"].fn(spark, SF_DIR)
    cols = ["vec_id", "cluster", "n_dups_to_lower", "is_kept"]
    assert _rows(lib, cols) == _rows(suite, cols)


def test_hll_api_matches_suite(spark):
    from marketing_etl_analytics_spark.ext import hll_estimate, hll_registers

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    regs = hll_registers(ev, "user_id", ["event_type"])
    est = hll_estimate(regs, ["event_type"]).withColumnRenamed("event_type", "grp")
    from marketing_etl_analytics_spark.suite.timeseries import ext_sketch_hll

    suite = ext_sketch_hll(spark, SF_DIR).filter(F.col("grp") != "(all)")
    cols = ["grp", "n_zero_registers", "hll_estimate"]
    assert _rows(est, cols) == _rows(suite.select(*cols), cols)


def test_hll_merge_is_lossless(spark):
    """Partial sketches over disjoint splits merge to the whole-data
    sketch — the distributed-aggregation contract."""
    from marketing_etl_analytics_spark.ext import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    whole = hll_estimate(hll_registers(ev, "user_id")).collect()[0]
    parts = hll_merge(
        hll_registers(ev.filter("event_id % 2 = 0"), "user_id").unionAll(
            hll_registers(ev.filter("event_id % 2 = 1"), "user_id")
        )
    )
    merged = hll_estimate(parts).collect()[0]
    assert merged["hll_estimate"] == whole["hll_estimate"]
    assert merged["n_zero_registers"] == whole["n_zero_registers"]


def test_countmin_api_matches_suite(spark):
    from marketing_etl_analytics_spark.ext import countmin_counters, countmin_query

    toks = (
        _docs(spark)
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counters = countmin_counters(toks, "tok")
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )
    est = countmin_query(counters, top.select("tok"), "tok")
    from marketing_etl_analytics_spark.suite.timeseries import ext_sketch_countmin

    suite = ext_sketch_countmin(spark, SF_DIR)
    cols = ["token", "cm_estimate"]
    lib = est.withColumnRenamed("tok", "token")
    assert _rows(lib, cols) == _rows(suite.select(*cols), cols)


def test_countmin_query_unseen_probe_estimates_zero(spark):
    """A probe value absent from the sketched data must return an
    estimate (0 unless it collides in ALL d rows), not vanish from
    the output — empty counter cells are zeros, not missing rows."""
    from marketing_etl_analytics_spark.ext import countmin_counters, countmin_query

    data = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, "v string")
    counters = countmin_counters(data, "v")
    probes = spark.createDataFrame(
        [("a",), ("never-seen-value",)], "v string"
    )
    got = {r["v"]: r["cm_estimate"] for r in countmin_query(counters, probes, "v").collect()}
    assert got["a"] == 5
    assert "never-seen-value" in got
    assert got["never-seen-value"] == 0  # all-4-cell collision is ~(2/512)^4


def test_semantic_dedup_narrow_vectors(spark):
    """The hot-cluster refine degrades gracefully on embeddings
    narrower than the 9..16 hyperplane dims (ANSI element_at would
    otherwise throw): 4-dim vectors cluster and dedup without error,
    with the refine key falling back to the cluster alone."""
    from marketing_etl_analytics_spark.ext import semantic_dedup

    rows = [(i, [float(i % 3 + 1), 1.0, -1.0, 0.5]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, n_centroids=2, cluster_cap=8, threshold=0.99)
    got = out.collect()
    assert len(got) == 40
    assert {r["vec_id"] for r in got} == set(range(40))


def test_semantic_dedup_farthest_seeding_balances_skew(spark):
    """Farthest-first seeding (r4, VERDICT r3 #2) spreads centroids
    across the embedding space; lowest-key seeding can land every
    seed inside one dense blob, collapsing the rest of the space onto
    few giant clusters. Synthetic: the lowest keys all sit in one
    tight cluster, while the corpus spans 4 well-separated directions
    — max cluster size must be strictly better (smaller) under
    farthest-first."""
    from marketing_etl_analytics_spark.ext import semantic_dedup

    dirs = {
        0: [10.0, 0.1, 0.1, 0.1],
        1: [0.1, 10.0, 0.1, 0.1],
        2: [0.1, 0.1, 10.0, 0.1],
        3: [0.1, 0.1, 0.1, 10.0],
    }
    rows = []
    for i in range(200):
        # keys 0..7 (the lowest) ALL in direction 0; the rest rotate
        d = 0 if i < 8 else i % 4
        base = dirs[d]
        rows.append((i, [c + 0.001 * (i % 7) for c in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def max_cluster(out):
        sizes = (
            out.groupBy("cluster").count().agg(F.max("count")).collect()[0][0]
        )
        return sizes

    far = semantic_dedup(df, n_centroids=4, cluster_cap=1000, threshold=2.0)
    low = semantic_dedup(
        df, n_centroids=4, cluster_cap=1000, threshold=2.0, seeding="lowest"
    )
    far_max, low_max = max_cluster(far), max_cluster(low)
    # lowest-key: all 4 seeds in direction 0 -> ties collapse the
    # other 3 directions onto few seeds; farthest-first covers all 4
    assert far_max < low_max
    assert far_max <= 60  # ~200/4 + the 8 planted low keys


def test_semantic_dedup_ivf_assign_matches_exact(spark):
    """assign='ivf' (r4, VERDICT r3 #3) routes centroid assignment
    through sqrt(k) super-centroids and probes n_probe of them —
    O(n*sqrt(k)) instead of O(n*k) dots per row.

    Two equality claims, matching what IVF can honestly promise:
    (a) on a CLUSTERED synthetic (where super-centroid proximity is
    informative — the regime IVF is for), the PRUNED path (n_probe=1
    of 3 supers) equals the exact argmax end-to-end; (b) on the
    graded corpora — whose synthetic embeddings are isotropic, so
    probing carries no signal and any pruned probe set mis-assigns —
    the full-probe path must still be row-identical to exact,
    pinning the two-level machinery (centroid->super homes, probe
    join, within-probe argmax) itself."""
    from marketing_etl_analytics_spark.ext import semantic_dedup

    cols = ["vec_id", "cluster", "n_dups_to_lower", "is_kept"]

    # (a) clustered synthetic: 8 tight direction-clusters in 8 dims,
    # k=8 centroids, 3 supers, ONE probe — pruned yet exact
    rows = []
    for i in range(240):
        d = i % 8
        v = [0.05] * 8
        v[d] = 10.0 + 0.01 * (i % 5)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = semantic_dedup(df, n_centroids=8, cluster_cap=1000, threshold=2.0)
    pruned = semantic_dedup(
        df, n_centroids=8, cluster_cap=1000, threshold=2.0,
        assign="ivf", n_probe=1,
    )
    assert _rows(exact, cols) == _rows(pruned, cols)

    # (b) graded corpora: full-probe IVF == exact (machinery parity),
    # and the pruned half-probe path still agrees on a majority of
    # assignments even though these embeddings are isotropic (the
    # worst case for probing — cluster proximity carries no signal)
    for sf in ("/root/testdata/sf0.001", SF_DIR):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        e = semantic_dedup(emb)
        i6 = semantic_dedup(emb, assign="ivf", n_probe=6)
        assert _rows(e, cols) == _rows(i6, cols), sf
        ecl = {r["vec_id"]: r["cluster"] for r in e.collect()}
        i3 = semantic_dedup(emb, assign="ivf", n_probe=3)
        agree = sum(
            1 for r in i3.collect() if ecl[r["vec_id"]] == r["cluster"]
        )
        assert agree / len(ecl) >= 0.55, sf


def test_semantic_dedup_empty_input(spark):
    """An empty input frame yields an empty result (not a crash) in
    both seeding modes — upstream curation stages can legitimately
    filter everything out."""
    from marketing_etl_analytics_spark.ext import semantic_dedup

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert semantic_dedup(df).count() == 0
    assert semantic_dedup(df, seeding="lowest").count() == 0


def test_hashmod_seeding_is_distributed_and_deterministic(spark):
    """'hashmod' seeding (r5, the large-k ADVICE path): seeds derived
    as a frame (one bucket groupBy — no driver greedy, no isin
    literals), deterministic across invocations, and the resulting
    assignment covers every row with clusters drawn from the seed
    set."""
    from marketing_etl_analytics_spark.ext.curation import (
        semantic_assign,
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    a1 = semantic_assign(emb, n_centroids=16, seeding="hashmod")
    a2 = semantic_assign(emb, n_centroids=16, seeding="hashmod")
    r1 = sorted(map(tuple, a1.collect()))
    assert r1 == sorted(map(tuple, a2.collect()))  # deterministic
    assert len(r1) == n  # every row assigned
    clusters = {r[1] for r in r1}
    assert 1 < len(clusters) <= 16  # occupied buckets, bounded by k
    # end-to-end: the full dedup runs on the hashmod index too
    out = semantic_dedup(emb, n_centroids=16, seeding="hashmod")
    assert out.count() == n


# --- global shuffle / split / shard ------------------------------------------


def test_shuffle_split_matches_suite(spark):
    from marketing_etl_analytics_spark.ext.curation import global_shuffle_split

    api = global_shuffle_split(_docs(spark), key="doc_id", seed=7, n_shards=8)
    suite = SUITE["ext_shuffle_split"].fn(spark, SF_DIR)
    cols = ["doc_id", "split", "shard", "pos"]
    assert _rows(api, cols) == _rows(suite, cols)


def test_shuffle_split_layout_invariants(spark):
    from marketing_etl_analytics_spark.ext.curation import global_shuffle_split

    docs = _docs(spark)
    n_docs = docs.count()
    out = global_shuffle_split(docs, key="doc_id", seed=7, n_shards=8)
    rows = out.collect()
    assert len(rows) == n_docs
    # every (split, shard) file is positions 0..count-1, no gaps/dups
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault((r.split, r.shard), []).append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # split fractions near 90/5/5 (md5 is uniform; tolerance is loose)
    frac = {
        r["split"]: r["count"] / n_docs
        for r in out.groupBy("split").count().collect()
    }
    assert abs(frac["train"] - 0.90) < 0.03
    assert abs(frac["val"] - 0.05) < 0.02
    assert abs(frac["test"] - 0.05) < 0.02
    # within-shard order is NOT the natural key order (it was shuffled)
    some = sorted(
        (r.pos, r.doc_id) for r in rows if (r.split, r.shard) == ("train", 0)
    )
    ids_in_pos_order = [d for _, d in some]
    assert ids_in_pos_order != sorted(ids_in_pos_order)


def test_shuffle_split_resharding_never_moves_docs_across_splits(spark):
    from marketing_etl_analytics_spark.ext.curation import global_shuffle_split

    docs = _docs(spark)
    a = global_shuffle_split(docs, key="doc_id", seed=7, n_shards=8)
    b = global_shuffle_split(docs, key="doc_id", seed=7, n_shards=32)
    sa = {r.doc_id: r.split for r in a.collect()}
    sb = {r.doc_id: r.split for r in b.collect()}
    assert sa == sb  # split depends only on the split draw, never shards


def test_kmeanspar_seeding_is_distributed_deterministic_and_recalls(spark):
    """'kmeanspar' seeding (r6, VERDICT r5 #4 — deterministic
    k-means||): seeds oversampled by content-addressed thresholding
    and weight-reduced to k entirely as DataFrame ops (no driver
    pool, no O(pool*k) greedy, no isin literals; supers in the ivf
    path are hash-bucket reps of the seed frame). Claims: (a)
    deterministic across invocations; (b) every row assigned,
    clusters bounded by k; (c) planted exact clones are ALWAYS
    recalled (identical vectors score identically against every
    centroid, so the deterministic argmax co-locates them — recall
    1.0 by construction, verified end-to-end through the ivf path)."""
    from marketing_etl_analytics_spark.ext.curation import (
        semantic_assign,
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    a1 = semantic_assign(emb, n_centroids=16, seeding="kmeanspar")
    a2 = semantic_assign(emb, n_centroids=16, seeding="kmeanspar")
    r1 = sorted(map(tuple, a1.collect()))
    assert r1 == sorted(map(tuple, a2.collect()))  # deterministic
    assert len(r1) == n  # every row assigned
    clusters = {r[1] for r in r1}
    assert 1 < len(clusters) <= 16  # occupied weight-buckets <= k

    # recall on planted clones through the full kmeanspar+ivf path:
    # 30 base vectors, each cloned once (vec_id + 1000)
    import math

    rows = []
    for i in range(30):
        # phase-shifted so no vector is all-zero (zero-norm vectors
        # are guarded in kmeanspar_seeds but unsupported by the
        # pre-existing assign stage's unguarded cosine)
        v = [math.sin(0.1 * (i + 1) * (j + 1)) for j in range(16)]
        rows.append((i, v))
        rows.append((1000 + i, list(v)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, n_centroids=8, cluster_cap=1000, threshold=0.999999,
        seeding="kmeanspar", assign="ivf", n_probe=2,
    )
    flagged = {r["vec_id"] for r in out.collect() if not r["is_kept"]}
    # every clone (the higher id of each pair) is flagged: recall 1.0
    assert flagged == {1000 + i for i in range(30)}
