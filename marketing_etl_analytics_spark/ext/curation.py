"""Corpus-curation operators, column-parameterized.

Library form of the suite's round-5 curation entries
(`ext_chunk_documents`, `ext_domain_balance`, `ext_sample_temperature`,
`ext_semantic_dedup`): the document→training-sequence chunker, the two
mixture-shaping samplers, and SemDeDup-style semantic deduplication.
Every decision is content-addressed (md5) or exact-decimal, so the
operators are deterministic under any partitioning — reproducible
corpus builds, idempotent reruns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Max collected center rows for the Arrow/NumPy closure evaluators
# (r10, guide §4.2): nearest-center assignment, IVF probing, and
# k-means|| state updates evaluate their (row x center) lattice dots
# vectorized per Arrow batch with the planning-sized center set in the
# task closure — no n*k crossJoin rows, no rank-window exchange, no
# interpreted ArrayAggregate lambda (CodegenFallback). Above this
# bound (k ~ 1e5 regimes: 8192 centers x 64 dims x 8 B = 4 MB closure
# is the comfort ceiling) the code falls back to the frame-only
# broadcast-join shape, which never collects centers to the driver.
ARROW_CENTERS_MAX = int(
    os.environ.get("SPARK_GRAFT_ARROW_CENTERS_MAX", "8192")
)


# --- model-based quality scoring ---------------------------------------------
#
# Linear proxy of a trained quality classifier (the fastText-style
# score real pipelines gate on): fixed integer weights over four
# doc-local features — stopword ratio (natural prose has stopwords),
# lexical diversity, length, and average token length. All features
# are snapped to 1e-4 scaled BIGINTs (floor(x*1e4 + 0.5) — the suite's
# pround on an integer lattice) and the logit is PURE INTEGER
# arithmetic, so the score and the keep verdict are bit-identical in
# Spark, DuckDB, and any engine. The sigmoid is deliberately omitted:
# it is monotone, so a threshold on the logit is the same decision as
# a threshold on the probability (the mean-IDF -> df-ratio precedent
# in ext_rarity_score), and exp() has no cross-libm exactness
# guarantee.

QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in")
# logit_1e4 = BIAS + W_STOP*sr + W_DISTINCT*dr + W_TOKENS*n_tokens*1e4
#             + W_TOKLEN*atl  (all on the 1e-4 lattice)
QUALITY_BIAS_1E4 = -30000      # -3.0
QUALITY_W_STOP = 20            # +20.0 per unit stopword ratio
QUALITY_W_DISTINCT = 4         # +4.0 per unit distinct-token ratio
QUALITY_W_TOKENS_1E4 = 200     # +0.02 per token
QUALITY_W_TOKLEN = 1           # +1.0 per char of avg token length
QUALITY_KEEP_1E4 = 57500       # keep iff logit >= 5.75


def quality_logit_1e4(toks, n_chars) -> "F.Column":
    """Scaled-integer quality logit over a token-array column and a
    char-count column. Codegen-only (size/filter/array_distinct +
    integer math): zero shuffle, zero UDF — the per-document scoring
    cost at 100 TB is one projection."""
    n_tokens = F.size(toks).cast("long")

    def s1e4(num, den):  # floor(num/den * 1e4 + 0.5) on the lattice
        return F.floor(
            num.cast("double") / den.cast("double") * 10000 + F.lit(0.5)
        ).cast("long")

    sr = s1e4(
        F.size(F.filter(toks, lambda w: w.isin(*QUALITY_STOPWORDS))), n_tokens
    )
    dr = s1e4(F.size(F.array_distinct(toks)), n_tokens)
    atl = s1e4(n_chars.cast("long") - n_tokens + 1, n_tokens)
    return (
        F.lit(QUALITY_BIAS_1E4)
        + F.lit(QUALITY_W_STOP) * sr
        + F.lit(QUALITY_W_DISTINCT) * dr
        + F.lit(QUALITY_W_TOKENS_1E4) * n_tokens
        + F.lit(QUALITY_W_TOKLEN) * atl
    ).cast("long")


def chunk_documents(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Fixed-size token-window chunks with overlap: (key, chunk_ord,
    n_chunk_tokens, chunk_text, chunk_hash).

    Row-local (zero shuffle): sequence+explode+slice+concat, all
    codegen builtins. The content hash feeds downstream exact dedup.
    """
    toks = df.select(
        F.col(key),
        F.split(F.col(text), " ").alias("_tok"),
        F.size(F.split(F.col(text), " ")).alias("_n"),
    )
    return toks.select(
        key,
        "_tok",
        "_n",
        F.explode(F.sequence(F.lit(1), F.col("_n"), F.lit(stride))).alias("_s"),
    ).select(
        key,
        (F.expr(f"(_s - 1) div {stride}") + 1).cast("long").alias("chunk_ord"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_s") + 1)
        .cast("long")
        .alias("n_chunk_tokens"),
        F.concat_ws(" ", F.slice("_tok", F.col("_s"), F.lit(chunk_tokens))).alias(
            "chunk_text"
        ),
        F.md5(
            F.concat_ws(" ", F.slice("_tok", F.col("_s"), F.lit(chunk_tokens)))
        ).alias("chunk_hash"),
    )


def domain_balance(
    df: DataFrame, key: str = "doc_id", stratum: str = "lang", cap_factor: int = 2
) -> DataFrame:
    """Cap every stratum at ``cap_factor`` x the smallest stratum's
    count; survivors chosen by deterministic md5 rank. Returns the
    selected rows as (key, stratum, sample_rank)."""
    counts = df.groupBy(stratum).agg(F.count(F.lit(1)).alias("n"))
    cap = counts.agg((F.lit(cap_factor) * F.min("n")).alias("_cap"))
    w = Window.partitionBy(stratum).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    return (
        df.select(key, stratum)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(cap))
        .filter(F.col("sample_rank") <= F.col("_cap"))
        .drop("_cap")
    )


def temperature_sample(
    df: DataFrame, key: str = "doc_id", stratum: str = "lang"
) -> DataFrame:
    """Temperature mixture sampling at alpha=0.5 (keep rate
    sqrt(n_min/n_s)); alpha is fixed at 0.5 because the rate is then
    a single correctly-rounded IEEE sqrt — bit-deterministic across
    engines, which a fractional pow() cannot guarantee. Returns kept
    rows with the rate and inverse-probability weight."""
    counts = df.groupBy(stratum).agg(F.count(F.lit(1)).alias("_n"))
    mn = counts.agg(F.min("_n").alias("_n_min"))
    u = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        / F.lit(4294967296.0)
    )
    return (
        df.select(key, stratum, u.alias("_u"))
        .join(F.broadcast(counts), stratum)
        .crossJoin(F.broadcast(mn))
        .withColumn("rate", F.sqrt(F.col("_n_min").cast("double") / F.col("_n")))
        .filter(F.col("_u") < F.col("rate"))
        .select(key, stratum, "rate", (F.lit(1.0) / F.col("rate")).alias("weight"))
    )


def quantize_pool(
    df: DataFrame, key: str, vec: str, pool_size: int
) -> list[tuple]:
    """The ``pool_size`` rows with the smallest (md5(key), key), each
    with its integer-quantized vector floor(x_i * 1000) — the
    deterministic uniform sample that seeds farthest-first selection.
    md5 hex ordering and floor-quantization are bit-identical across
    Spark, DuckDB, and Python, so every consumer derives the same
    pool. The collect is PLANNING-sized: O(pool_factor * k) rows,
    never corpus-sized (the acid-manifest precedent)."""
    qvec = f"transform({vec}, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    rows = (
        df.select(
            F.col(key).alias("k"),
            F.expr(qvec).alias("q"),
            F.md5(F.col(key).cast("string")).alias("h"),
        )
        .orderBy("h", "k")
        .limit(pool_size)
        .collect()
    )
    return [(r["k"], list(r["q"])) for r in rows]


def farthest_first_from_pool(pool: list[tuple], k: int) -> list:
    """Gonzalez (1985) k-center greedy over a quantized pool: start
    from the pool's hash-first row, then repeatedly take the
    candidate farthest (max min-distance, exact integer L2^2 on the
    quantized vectors) from the chosen set; ties break on the smaller
    key. The deterministic counterpart of k-means++ seeding — pure
    integer arithmetic, so Python, Spark SQL, and the DuckDB oracle
    reproduce the identical seed set."""

    if not pool:
        return []

    def d2(a: list, b: list) -> int:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    qs = dict(pool)
    chosen = [pool[0][0]]
    # min-distance-to-chosen per candidate, updated incrementally
    mind = {key: d2(q, pool[0][1]) for key, q in pool[1:]}
    while len(chosen) < k and mind:
        best_key, best_d = None, -1
        for key, dm in mind.items():
            if dm > best_d or (dm == best_d and key < best_key):
                best_key, best_d = key, dm
        chosen.append(best_key)
        nq = qs[best_key]
        del mind[best_key]
        for key in mind:
            nd = d2(qs[key], nq)
            if nd < mind[key]:
                mind[key] = nd
    return chosen


# --- distributed k-means||-style seeding (r6, VERDICT r5 #4) -----------------
#
# Bahmani et al. 2012 (k-means||): oversample ~ell candidates per
# round proportionally to each point's squared distance from the
# current seed set, for O(log n) rounds, then reduce the ~ell*rounds
# candidates to k by weight. This deterministic variant replaces the
# random draws with CONTENT-ADDRESSED thresholding — point x is
# sampled in a round iff u(x) * S < ell * dmin^2(x), where u(x) is
# the md5-uniform of its key and S the decimal-snapped corpus sum of
# dmin^2 — so every engine (and the DuckDB oracle) derives the
# identical candidate set with no RNG state. The final reduction is
# ALSO a frame op: candidates are weighted by how many corpus rows
# they are nearest to, bucketed by md5(key) % k, and the max-weight
# candidate per bucket wins (tiebreak: smaller key). Seeds therefore
# stay a DataFrame end-to-end: no driver-side pool collect, no
# O(pool*k) Python greedy, no isin(<k literals>) — the seeding path
# that survives k~1e5 (the farthest-first pool path remains for the
# k~sqrt(n) SemDeDup regime where its k-center spread guarantee is
# worth the planning-sized collect).

KMPAR_ROUNDS = 3


def _dot_expr() -> str:
    """Exact dot product template on the 1e-12 integer lattice.

    Per-term FLOOR(x*y * 1e12 + 0.5) on identical IEEE doubles is
    engine-invariant, and BIGINT addition is exact and order-free —
    the SPARK_DOT/SQL_DOT discipline (suite/ext.py, hardened fc3b048)
    that the suite oracles for the semantic-dedup entries already
    replay. The previous per-term CAST(... AS DECIMAL(38,12)) snap was
    both slower (interpreted BigDecimal per term inside the
    higher-order function) and the one place the engine's formula
    differed from its own oracle's."""
    return (
        "(CAST(aggregate(sequence(1, size({a})), CAST(0 AS BIGINT),"
        " (acc, i) -> acc + CAST(FLOOR(CAST(element_at({a}, i) AS DOUBLE)"
        " * CAST(element_at({b}, i) AS DOUBLE) * 1e12 + 0.5) AS BIGINT))"
        " AS DOUBLE) / 1e12)"
    )


def kmeanspar_seeds(
    b: DataFrame,
    key: str,
    vec: str,
    n_centroids: int,
    rounds: int = KMPAR_ROUNDS,
    ell_factor: int = 2,
) -> DataFrame:
    """Deterministic k-means|| seed selection over a pre-normed frame
    ``b`` with columns (key, vec, _n2). Returns (_cid, _ce, _cn2) —
    at most ``n_centroids`` rows (occupied weight-buckets), a frame.

    Geometry is cosine distance d = 1 - cos (the dedup metric);
    within a round dmin is a MIN over the broadcast seed frame —
    O(n * |seeds|) exact-decimal dots per round, |seeds| <= 1 +
    ell*rounds ~ O(k). The per-round seed frame is localCheckpoint'ed
    (planning-sized) so round r's plan does not re-derive rounds
    1..r-1."""
    ell = ell_factor * n_centroids
    h = F.md5(F.col(key).cast("string"))
    u = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0)
    )
    base = b.select(
        F.col(key).alias("_k"),
        F.col(vec).alias("_v"),
        F.col("_n2").alias("_vn2"),
        u.alias("_u"),
        h.alias("_h"),
    )
    seed_cols = [
        F.col("_k").alias("_cid"),
        F.col("_v").alias("_ce"),
        F.col("_vn2").alias("_cn2"),
    ]
    seeds = (
        base.orderBy("_h", "_k").limit(1).select(*seed_cols)
        .localCheckpoint(eager=True)
    )
    # zero-norm vectors (legitimate in filtered corpora) get cos 0 /
    # distance 1 instead of an ANSI divide-by-zero; mirrored in the
    # suite oracle (_sql_kmeanspar_ctes)
    cos = F.coalesce(
        F.expr(_dot_expr().format(a="_v", b="_ce"))
        / F.nullif(F.sqrt(F.col("_vn2") * F.col("_cn2")), F.lit(0.0)),
        F.lit(0.0),
    )
    d = F.greatest(F.lit(0.0), F.lit(1.0) - cos)
    # Arrow/NumPy closure path (r10, guide §4.2): the seed sets here
    # are planning-sized (<= 1 + ell*rounds rows), so each corpus pass
    # — the initial distance, every round's running-min update, and
    # the final nearest-seed weights — evaluates its lattice dots
    # vectorized per Arrow batch with the seeds in the task closure.
    # Values are bit-identical to the expression form (the
    # arrow_lattice_dots proof: same IEEE ops on the same operands;
    # min/least are selections), and the previous per-round
    # groupBy(_k, _v, _vn2, _u).min shuffle — the corpus, CARRYING the
    # 64-dim vectors, exchanged once per round — disappears entirely.
    from marketing_etl_analytics_spark.ext.embedding import (
        arrow_min_center_dist,
        arrow_nearest_center,
    )

    use_arrow = (1 + ell * rounds) <= ARROW_CENTERS_MAX

    def _rows(frame: DataFrame) -> list[tuple]:
        return [
            (r["_cid"], list(r["_ce"]), float(r["_cn2"]))
            for r in frame.collect()
        ]

    # Carried min-distance state (the k-center/Lloyd zero-recompute
    # discipline): dmin over a growing seed set is monotone, so each
    # round only dots the corpus against the round's NEW seeds and
    # takes least(carried, new) — min over a union equals
    # min(min(old), min(new)) exactly (selection, not arithmetic, so
    # no FP-order concern). The previous shape re-dotted every row
    # against the FULL seed frame each round AND re-evaluated that
    # pass twice (once under the S-total broadcast, once under the
    # threshold filter): O(rounds * n * |seeds|) interpreted dots,
    # now O(n * |new seeds|) total with each pass materialized once.
    if use_arrow:
        state = arrow_min_center_dist(
            base.select("_k", "_v", "_vn2", "_u"),
            "_v", "_vn2", _rows(seeds), "_d",
        ).localCheckpoint(eager=True)
    else:
        state = (
            base.crossJoin(F.broadcast(seeds))
            .select("_k", "_v", "_vn2", "_u", d.alias("_d"))
            .localCheckpoint(eager=True)
        )
    for r in range(rounds):
        # integer-lattice snap of d^2 (ADVICE r6): per-term
        # CAST(double AS DECIMAL(38,12)) tie-rounds differently in
        # Java BigDecimal (HALF_UP) vs DuckDB (scaled multiply) — the
        # 1-ulp class BASELINE.md documents flipping a value at sf10
        # for ext_embed_transform. floor((d*d)*1e12 + 0.5) is pure
        # IEEE arithmetic (engine-invariant); the lattice integers sum
        # EXACTLY as DECIMAL(38,0) (BIGINT would overflow at corpus
        # scale), and the draw compares in lattice units on both
        # sides, so no decimal tie-rounding ever touches the strict
        # inequality u*S < ell*d^2.
        dmin = state.withColumn(
            "_d2l",
            F.floor(F.col("_d") * F.col("_d") * F.lit(1e12) + F.lit(0.5)),
        )
        s_tot = dmin.agg(
            F.sum(F.col("_d2l").cast("decimal(38,0)"))
            .cast("double")
            .alias("_S")
        )
        new = (
            dmin.crossJoin(F.broadcast(s_tot))
            .filter(
                F.col("_u") * F.col("_S")
                < F.lit(float(ell)) * F.col("_d2l").cast("double")
            )
            .select(
                F.col("_k").alias("_cid"),
                F.col("_v").alias("_ce"),
                F.col("_vn2").alias("_cn2"),
            )
            .localCheckpoint(eager=True)
        )
        seeds = seeds.unionByName(new).localCheckpoint(eager=True)
        # state only feeds the NEXT round's draw; skip the update on
        # the last round, and when the draw selected nothing (the
        # crossJoin below would otherwise empty the state)
        if r < rounds - 1 and not new.isEmpty():
            if use_arrow:
                # zero-shuffle running-min update: one vectorized scan,
                # least(carried, min over the round's NEW seeds)
                state = arrow_min_center_dist(
                    state, "_v", "_vn2", _rows(new), "_d", carry="_d",
                ).localCheckpoint(eager=True)
            else:
                state = (
                    state.crossJoin(F.broadcast(new))
                    .groupBy("_k", "_v", "_vn2", "_u")
                    .agg(F.min(F.least(F.col("_d"), d)).alias("_d"))
                    .localCheckpoint(eager=True)
                )
    # weight each candidate by the corpus rows nearest to it
    # (tiebreak: higher cos, then smaller candidate key), then reduce
    # to k via md5-bucket max-weight
    if use_arrow:
        # nearest-seed id per row computed in the same vectorized scan
        # (desc cos with the zero-norm guard, tie -> smaller _cid —
        # the evaluator replicates the window's ordering exactly);
        # only (_k -> _cid) leaves the Python boundary
        weights = (
            arrow_nearest_center(
                base.select("_k", "_v", "_vn2"),
                "_v", "_vn2", _rows(seeds), "_cid",
                keep=["_k"], zero_cos=0.0,
            )
            .groupBy("_cid")
            .agg(F.count(F.lit(1)).alias("_w"))
        )
    else:
        # frame path: project to (_k, _cid, cos) BEFORE the window
        # (guide §2.3): the rank only needs the score, so neither
        # 64-dim vector rides the window exchange, and the cos is
        # evaluated once per row as a column instead of inside the
        # SortOrder (where GenerateOrdering re-evaluates it per
        # comparison)
        wnear = Window.partitionBy("_k").orderBy(
            F.desc("_cw"), F.asc("_cid")
        )
        weights = (
            base.crossJoin(F.broadcast(seeds))
            .select("_k", "_cid", cos.alias("_cw"))
            .withColumn("_r", F.row_number().over(wnear))
            .filter(F.col("_r") == 1)
            .groupBy("_cid")
            .agg(F.count(F.lit(1)).alias("_w"))
        )
    bkt = (
        F.conv(F.substring(F.md5(F.col("_cid").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % F.lit(n_centroids)
    )
    wpick = Window.partitionBy("_bkt").orderBy(F.desc("_w"), F.asc("_cid"))
    return (
        seeds.join(F.broadcast(weights), "_cid", "left")
        .select(
            "_cid", "_ce", "_cn2",
            F.coalesce("_w", F.lit(0)).alias("_w"),
            bkt.alias("_bkt"),
        )
        .withColumn("_pr", F.row_number().over(wpick))
        .filter(F.col("_pr") == 1)
        .select("_cid", "_ce", "_cn2")
    )


def semantic_assign(
    df: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    n_centroids: int = 32,
    cluster_cap: int = 128,
    seeding: str = "farthest",
    pool_factor: int = 8,
    assign: str = "exact",
    n_probe: int = 3,
) -> DataFrame:
    """SemDeDup assignment stage: nearest-seed-centroid clusters
    (broadcast argmax or IVF-probed), hot clusters re-split on 8
    hyperplane sign bits. Returns (key, cluster, _ckey) — the
    per-corpus cluster index. At cluster scale this IS a persisted
    table built once per corpus version (the suite memoizes it via
    memo_df and feeds it back to semantic_dedup(keyed=...)).

    Choose n_centroids ~ sqrt(n) (the SemDeDup regime); the cap
    bounds pairwise work at sum(c_i^2) regardless of corpus size.

    ``seeding``: 'farthest' (default) picks centroids by farthest-
    first traversal over a deterministic md5-ordered sample of
    pool_factor*k rows — the k-center greedy that k-means++
    randomizes, here exact-integer and engine-reproducible. Seed
    quality determines cluster BALANCE, and balance is what the
    sum(c_i^2) bound actually buys: lowest-key seeds ('lowest', the
    legacy mode) can all land in one dense region, collapsing the
    rest of the space onto few giant clusters (pinned by the skewed-
    synthetic pytest). 'hashmod' (r5) is the distributed large-k
    mode: hash-first row per md5 bucket, seeds stay a frame — no
    driver greedy, no isin literals; the k~1e5 seeding path.

    ``assign``: 'exact' scores every row against all k centroids
    (O(n*k) dots — fine at k~sqrt(n) up to modest k). 'ivf' routes
    assignment through ceil(sqrt(k)) super-centroids (farthest-first
    over the seed set): each row scores the super-centroids, then
    only the member centroids of its ``n_probe`` nearest
    super-clusters — O(n*(sqrt(k) + n_probe*sqrt(k))) dots, the
    IVF-probe shape that keeps the ASSIGNMENT step tractable at
    k~1e5. With ``seeding='kmeanspar'`` (r6, VERDICT r5 #4) the
    whole path is frame-only: k-means||-style seeds
    (``kmeanspar_seeds``) AND hash-bucket super-centroids come from
    DataFrame ops joined downstream — no driver pool collect, no
    O(pool*k) greedy, no isin(<k literals>) — the k~1e5 shape. The
    'farthest' pool path remains for the k~sqrt(n) SemDeDup regime
    where its k-center spread guarantee is worth the planning-sized
    collect. Approximate in general (a row whose true centroid lives
    outside the probed super-clusters mis-assigns); equality vs exact
    argmax on the graded corpora is pinned by pytest.
    """
    dot = _dot_expr()  # 1e-12 integer-lattice dot (engine-invariant)
    # refine bits come from dims 9..16 when they exist; clamped to the
    # vector's width (sequence counts DOWN past the end, and ANSI-mode
    # element_at throws on out-of-range — both guarded), degrading to
    # sub=0 (no refine) for vectors narrower than 9 dims
    sub = (
        f"CASE WHEN size({vec}) >= 9 THEN "
        f"CAST(aggregate(sequence(9, least(16, size({vec}))), CAST(0 AS BIGINT),"
        f" (acc, i) -> acc + CASE WHEN CAST(element_at({vec}, i) AS DOUBLE) > 0"
        " THEN CAST(pow(2, i - 9) AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END"
    )
    b = df.select(
        F.col(key),
        F.col(vec),
        F.expr(dot.format(a=vec, b=vec)).alias("_n2"),
        F.expr(sub).alias("_sub"),
    )
    cent_cols = [
        F.col(key).alias("_cid"),
        F.col(vec).alias("_ce"),
        F.col("_n2").alias("_cn2"),
    ]
    if seeding == "farthest":
        pool = quantize_pool(df, key, vec, pool_factor * n_centroids)
        seed_keys = farthest_first_from_pool(pool, n_centroids)
        cent = (
            b.filter(F.col(key).isin(seed_keys)).select(*cent_cols)
            if seed_keys
            else b.limit(0).select(*cent_cols)  # empty input frame
        )
    elif seeding == "lowest":
        cent = b.orderBy(key).limit(n_centroids).select(*cent_cols)
    elif seeding == "kmeanspar":
        # r6 (VERDICT r5 #4): deterministic k-means|| — oversample by
        # threshold each round, weight-reduce to k via md5 buckets;
        # seeds are a FRAME end-to-end (see kmeanspar_seeds)
        cent = kmeanspar_seeds(
            b.select(key, vec, "_n2"), key, vec, n_centroids
        ).select(
            F.col("_cid"), F.col("_ce"), F.col("_cn2")
        )
    elif seeding == "hashmod":
        # Distributed seeding for LARGE k (the ADVICE r4 path): k
        # md5-derived buckets, seed = hash-first row per bucket. One
        # shuffle on the bucket id, seeds stay a FRAME end-to-end —
        # no driver-side greedy, no isin(<k literals>) plan-time
        # blowup, so k~1e5 seeding costs the same as any groupBy.
        # Trades farthest-first's k-center spread guarantee for full
        # distribution; content-addressed, hence deterministic and
        # engine-reproducible like every other seeding mode. Occupied
        # buckets can be < k on small inputs (seeds = occupied count).
        h = F.md5(F.col(key).cast("string"))
        bkt = (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(n_centroids)
        )
        ws = Window.partitionBy("_bkt").orderBy("_h", key)
        cent = (
            b.select(key, vec, "_n2", h.alias("_h"), bkt.alias("_bkt"))
            .withColumn("_srn", F.row_number().over(ws))
            .filter(F.col("_srn") == 1)
            .select(*cent_cols)
        )
    else:
        raise ValueError(f"unknown seeding mode: {seeding!r}")
    cos_c = F.expr(dot.format(a=vec, b="_ce")) / F.sqrt(F.col("_n2") * F.col("_cn2"))
    # Arrow/NumPy closure path (r10, guide §4.2): with a planning-
    # sized center set, the probe/argmax dots run vectorized per
    # Arrow batch — no n*k crossJoin rows, no rank-window exchange.
    # Bit-identical to the expression form (arrow_lattice_dots proof;
    # NaN ranks greatest like Spark's sort; ties break on asc center
    # id). Above ARROW_CENTERS_MAX the frame-only broadcast shape
    # below remains the k~1e5 path.
    from marketing_etl_analytics_spark.ext.embedding import (
        arrow_ivf_assign,
        arrow_nearest_center,
    )

    use_arrow = n_centroids <= ARROW_CENTERS_MAX

    def _empty_assign() -> DataFrame:
        return b.limit(0).select(
            F.col(key),
            F.col(key).cast("long").alias("cluster"),
            F.col("_sub"),
        )

    # every rank below orders by a PRECOMPUTED score column and
    # projects the vectors away before the window exchange (guide
    # §2.3): the 64-dim arrays never ride a shuffle just to be
    # re-dotted inside a SortOrder comparator
    w = Window.partitionBy(key).orderBy(F.desc("_cc"), F.asc("_cid"))
    if assign == "ivf":
        import math

        n_super = max(1, math.isqrt(max(n_centroids - 1, 0)) + 1)
        if seeding == "kmeanspar":
            # fully-distributed mode (VERDICT r5 #4): super-centroids
            # are the hash-first SEED per md5 bucket — one window over
            # the k-row seed frame, no collect, no isin; supers (like
            # seeds) stay a frame at k~1e5
            sh = F.md5(F.col("_cid").cast("string"))
            sbkt = (
                F.conv(F.substring(sh, 1, 8), 16, 10).cast("long")
                % F.lit(n_super)
            )
            wsup = Window.partitionBy("_sbkt").orderBy("_sh", "_cid")
            sup = (
                cent.select(
                    "_cid", "_ce", "_cn2",
                    sh.alias("_sh"), sbkt.alias("_sbkt"),
                )
                .withColumn("_srn", F.row_number().over(wsup))
                .filter(F.col("_srn") == 1)
                .select(
                    F.col("_cid").alias("_sid"),
                    F.col("_ce").alias("_se"),
                    F.col("_cn2").alias("_sn2"),
                )
            )
        else:
            # super-centroids: farthest-first over the SEEDS'
            # quantized vectors (k rows — planning-sized collect,
            # like the pool)
            qexpr = "transform(_ce, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
            spool = [
                (r["_cid"], list(r["_q"]))
                for r in cent.select(
                    "_cid",
                    F.expr(qexpr).alias("_q"),
                    F.md5(F.col("_cid").cast("string")).alias("_h"),
                )
                .orderBy("_h", "_cid")
                .collect()
            ]
            super_keys = farthest_first_from_pool(spool, n_super)
            sup = b.filter(F.col(key).isin(super_keys)).select(
                F.col(key).alias("_sid"),
                F.col(vec).alias("_se"),
                F.col("_n2").alias("_sn2"),
            )
        # centroid -> home super-cluster (k x sqrt(k), both broadcast)
        cos_cs = F.expr(dot.format(a="_ce", b="_se")) / F.sqrt(
            F.col("_cn2") * F.col("_sn2")
        )
        wcs = Window.partitionBy("_cid").orderBy(F.desc("_ccs"), F.asc("_sid"))
        cmember = (
            cent.crossJoin(F.broadcast(sup))
            .select("_cid", "_ce", "_cn2", "_sid", cos_cs.alias("_ccs"))
            .withColumn("_r", F.row_number().over(wcs))
            .filter(F.col("_r") == 1)
            .select("_cid", "_ce", "_cn2", F.col("_sid").alias("_home"))
        )
        # row -> n_probe nearest super-clusters, then argmax over the
        # member centroids of those probes only: O(n*(sqrt(k) +
        # n_probe * k/sqrt(k))) dots instead of O(n*k)
        if use_arrow:
            # one vectorized corpus pass does the probe ranking AND
            # the member argmax (supers + homed centroids in the task
            # closure); the previous shape materialized n*n_probe
            # probe rows CARRYING the 64-dim vectors through a rank
            # window, joined members, then ranked again
            sup_rows = [
                (r["_sid"], list(r["_se"]), float(r["_sn2"]))
                for r in sup.collect()
            ]
            cm_rows = [
                (r["_cid"], list(r["_ce"]), float(r["_cn2"]), r["_home"])
                for r in cmember.collect()
            ]
            if not sup_rows or not cm_rows:
                assign = _empty_assign()
            else:
                assign = arrow_ivf_assign(
                    b.select(key, vec, "_n2", "_sub"),
                    vec, "_n2", sup_rows, cm_rows, n_probe,
                    "cluster", keep=[key, "_sub"],
                ).select(key, "cluster", "_sub")
        else:
            cos_ds = F.expr(dot.format(a=vec, b="_se")) / F.sqrt(
                F.col("_n2") * F.col("_sn2")
            )
            wds = Window.partitionBy(key).orderBy(
                F.desc("_cds"), F.asc("_sid")
            )
            probes = (
                b.crossJoin(F.broadcast(sup))
                .select(key, vec, "_n2", "_sub", "_sid", cos_ds.alias("_cds"))
                .withColumn("_r", F.row_number().over(wds))
                .filter(F.col("_r") <= n_probe)
                .select(key, vec, "_n2", "_sub", F.col("_sid").alias("_home"))
            )
            assign = (
                probes.join(F.broadcast(cmember), "_home")
                .select(key, "_sub", "_cid", cos_c.alias("_cc"))
                .withColumn("_crn", F.row_number().over(w))
                .filter(F.col("_crn") == 1)
                .select(key, F.col("_cid").alias("cluster"), "_sub")
            )
    elif assign == "exact":
        if use_arrow:
            cent_rows = [
                (r["_cid"], list(r["_ce"]), float(r["_cn2"]))
                for r in cent.collect()
            ]
            if not cent_rows:
                assign = _empty_assign()
            else:
                assign = arrow_nearest_center(
                    b.select(key, vec, "_n2", "_sub"),
                    vec, "_n2", cent_rows, "cluster", keep=[key, "_sub"],
                ).select(key, "cluster", "_sub")
        else:
            assign = (
                b.crossJoin(F.broadcast(cent))
                .select(key, "_sub", "_cid", cos_c.alias("_cc"))
                .withColumn("_crn", F.row_number().over(w))
                .filter(F.col("_crn") == 1)
                .select(key, F.col("_cid").alias("cluster"), "_sub")
            )
    else:
        raise ValueError(f"unknown assign mode: {assign!r}")
    hot = (
        assign.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("_cn"))
        .filter(F.col("_cn") > cluster_cap)
        .select("cluster", F.lit(True).alias("_hot"))
    )
    keyed = assign.join(F.broadcast(hot), "cluster", "left").select(
        key,
        "cluster",
        F.when(
            F.col("_hot").isNotNull(),
            F.concat_ws(":", F.col("cluster").cast("string"), F.col("_sub").cast("string")),
        )
        .otherwise(F.col("cluster").cast("string"))
        .alias("_ckey"),
    )
    return keyed


def semantic_dedup(
    df: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    n_centroids: int = 32,
    cluster_cap: int = 128,
    threshold: float = 0.35,
    seeding: str = "farthest",
    pool_factor: int = 8,
    assign: str = "exact",
    n_probe: int = 3,
    keyed: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup: semantic_assign's clusters, then within-cluster
    cosine pairs >= threshold flag the higher key as a duplicate of
    the lower. Returns (key, cluster, n_dups_to_lower, is_kept).

    ``keyed``: pass a precomputed/memoized semantic_assign result to
    skip rebuilding the cluster index (the suite's memo_df pattern —
    the index is the amortized artifact; assignment parameters are
    then taken from it, not from this call's arguments).
    """
    dot = _dot_expr()  # 1e-12 integer-lattice dot (engine-invariant)
    if keyed is None:
        keyed = semantic_assign(
            df,
            key=key,
            vec=vec,
            n_centroids=n_centroids,
            cluster_cap=cluster_cap,
            seeding=seeding,
            pool_factor=pool_factor,
            assign=assign,
            n_probe=n_probe,
        )
    b = df.select(
        F.col(key), F.col(vec), F.expr(dot.format(a=vec, b=vec)).alias("_n2")
    )
    m = keyed.join(b.select(key, vec, "_n2"), key)
    mu = m.select(
        "_ckey",
        F.col(key).alias("_u"),
        F.col(vec).alias("_ue"),
        F.col("_n2").alias("_un2"),
    )
    mv = m.select(
        F.col("_ckey").alias("_ckey_v"),
        F.col(key).alias("_v"),
        F.col(vec).alias("_ve"),
        F.col("_n2").alias("_vn2"),
    )
    # pair-verify dots via the Arrow/NumPy lattice evaluator (guide
    # §4.2; bit-identical to the SQL lattice dot, pinned by pytest):
    # the vectors are dropped at the Python boundary, so only
    # (u, v, norms, dot) flows into the threshold filter
    from marketing_etl_analytics_spark.ext.embedding import (
        arrow_lattice_dots,
    )

    scored = arrow_lattice_dots(
        mu.join(mv, (mu._ckey == mv._ckey_v) & (mu._u < mv._v))
        .select("_u", "_v", "_un2", "_vn2", "_ue", "_ve"),
        "_ue", "_ve", "_dot",
    )
    dups = (
        scored.filter(
            F.col("_dot") / F.sqrt(F.col("_un2") * F.col("_vn2"))
            >= threshold
        )
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .withColumnRenamed("_v", key)
    )
    return keyed.join(dups, key, "left").select(
        key,
        F.col("cluster").cast("long").alias("cluster"),
        F.coalesce("_nd", F.lit(0)).cast("long").alias("n_dups_to_lower"),
        (F.coalesce("_nd", F.lit(0)) == 0).alias("is_kept"),
    )


# --- deterministic global shuffle / split / shard ----------------------------
#
# The training-export layout step: before an LLM ever sees the corpus,
# the pipeline (a) splits it into train/val/test, (b) SHUFFLES it into
# a pseudo-random global order (so minibatches are i.i.d.-ish and no
# shard is all-one-domain), and (c) lays it out as a fixed number of
# shard files with a stable position for each example. All three
# decisions here are content-addressed md5 arithmetic — no RNG state,
# no driver: rerunning on any cluster, any partitioning, any engine
# reproduces the identical layout bit-for-bit (the property that makes
# resumable exports and cross-run diffing possible).
#
# Scale shape: one shuffle on (split, shard). The per-shard position
# is a ROW_NUMBER window per (split, shard) — each shard is one window
# task, which is exactly right because n_shards is chosen as
# corpus_size / target_shard_file_size, so a shard IS the unit of
# output work. There is no global sort and no driver-side state.

SPLIT_PCT_TRAIN = 90
SPLIT_PCT_VAL = 5  # test = 100 - train - val


def _md5_48(prefix: str, col) -> "F.Column":
    """48-bit integer from md5('<prefix>:' || key) — the sketches.py
    hashing family; the prefix makes independent hash draws."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(prefix + ":"), col.cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("long")


def global_shuffle_split(
    df: DataFrame,
    key: str = "doc_id",
    seed: int = 7,
    n_shards: int = 8,
    pct_train: int = SPLIT_PCT_TRAIN,
    pct_val: int = SPLIT_PCT_VAL,
) -> DataFrame:
    """Per-row (split, shard, pos) assignment for training export.

    Two independent md5 draws per row: the SPLIT key (percent bucket
    on draw one — so changing n_shards never moves a document across
    splits, the invariant eval-set hygiene depends on) and the
    SHUFFLE key (draw two — shard = hs % n_shards, and the order
    WITHIN a shard is ascending hs, i.e. pseudo-random, never
    source/date order). ``pos`` is the 0-based offset of the row in
    its shard file.
    """
    hk = _md5_48(f"split{seed}", F.col(key))
    hs = _md5_48(f"shard{seed}", F.col(key))
    split = (
        F.when(hk % 100 < pct_train, "train")
        .when(hk % 100 < pct_train + pct_val, "val")
        .otherwise("test")
    )
    keyed = df.select(
        F.col(key),
        split.alias("split"),
        (hs % n_shards).cast("long").alias("shard"),
        hs.alias("_hs"),
    )
    pos = F.row_number().over(
        Window.partitionBy("split", "shard").orderBy("_hs", key)
    )
    return keyed.select(
        key, "split", "shard", (pos - 1).cast("long").alias("pos")
    )
