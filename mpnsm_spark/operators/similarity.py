"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the baseline. The query set is
  broadcast; the corpus is scanned once; all arithmetic is JVM-side
  (``zip_with`` + ``aggregate`` fold), no UDF, no shuffle until the final
  per-query top-k window over scored rows.
- ``ivf_*``: the scale path. Corpus vectors are assigned to their nearest
  centroid (inverted file); a query probes only ``n_probe`` centroid buckets,
  cutting the scanned fraction to ~n_probe/n_centroids. Centroids here are a
  deterministic corpus sample (a k-means step can refine them later without
  changing the query path).
- ``cosine_near_dup_pairs``: random-hyperplane sign-LSH buckets, then exact
  cosine within buckets — embedding near-duplicate detection for training-
  data dedup.

At 10^12-row design scale the IVF bucket column becomes the table's
partition/cluster key so probes prune files; the brute-force path remains for
oracle verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mpnsm_spark.operators.skew import fan_out


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_static(a: Column, b: Column, dim: int) -> Column:
    """Unrolled dot product for a KNOWN dimension: the same left fold as
    :func:`_dot` (acc starts at 0.0; acc + a[i]*b[i] in index order — bitwise
    identical), but built from ``getItem`` expressions so it runs inside
    whole-stage codegen instead of the interpreted higher-order ``aggregate``
    evaluator (~10× per-row in join conditions over candidate pairs)."""
    acc: Column = F.lit(0.0)
    for i in range(dim):
        # cast BEFORE multiplying, exactly as _dot's zip_with lambda does —
        # for array<float> inputs a float×float multiply would round once in
        # float and diverge bitwise from the cast-then-multiply sequence
        acc = acc + a.getItem(i).cast("double") * b.getItem(i).cast("double")
    return acc


# Static unrolling cutoff: every `getItem` term is ~4 py4j round-trips at
# Column-construction time plus analyzer work over the resulting tree, paid
# PER QUERY BUILD on the driver. Measured at dim=64 the unrolled build costs
# seconds (ann/ivf regressed 3-4x) while the interpreted higher-order fold —
# once the corpus scan is fan_out-spread — evaluates in parallel and is no
# longer the bottleneck. Small dims (the 16-dim hashed-embedding dedup path,
# where candidate volume is quadratic) still win from codegen unrolling.
_STATIC_UNROLL_MAX = 16


def _dot_auto(a: Column, b: Column, dim: int | None) -> Column:
    """_dot_static for small known dims, the higher-order fold otherwise —
    the two are bitwise-identical by the :func:`_dot_static` contract, so
    this is purely a build-cost/eval-cost tradeoff."""
    if dim and dim <= _STATIC_UNROLL_MAX:
        return _dot_static(a, b, dim)
    return _dot(a, b)


def _norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(_dot_auto(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity; pass ``dim`` when the vector width is statically
    known — small dims evaluate via the unrolled codegen fold (same float op
    sequence as the interpreted higher-order aggregate — see
    :func:`_dot_static` — so scores are bitwise identical either way)."""
    num = _dot_auto(a, b, dim)
    return num / (_norm(a, dim) * _norm(b, dim))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id, score).

    Deterministic tie-break on neighbor id. Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # Scoring is per-row expensive (dim multiply-adds × queries); a one-file
    # corpus scan is a single task — spread it first (no-op at real scale).
    c = fan_out(corpus.select(id_col, vec_col), key=id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec"), dim).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


# ------------------------------------------------------------------------ IVF


def sample_centroids(
    corpus: DataFrame, n_centroids: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic centroid pick: the n lowest md5(id) corpus vectors — a
    seeded pseudo-random but reproducible sample any SQL engine can replay.

    ``orderBy(..).limit(n)`` compiles to TakeOrderedAndProject: a per-partition
    size-n heap merged on the driver — O(rows) scan, no global sort, so it is
    safe at corpus scale (every deterministic exact pick must scan once).
    """
    picked = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_centroids)
    )
    # Number the n picked rows WITHOUT a window: a global row_number over n
    # post-limit rows is semantically a single-partition window, and
    # WindowExec warns "No Partition Defined" on it (a constant partitionBy
    # folds away, so it warns too) — noise that hides real regressions in
    # bench logs. collect_list -> array_sort -> posexplode gives the same
    # (id-ascending) numbering as one tiny aggregate.
    arr = picked.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(vec_col).alias("v")))
        ).alias("a")
    )
    return arr.select(F.posexplode("a").alias("pos", "s")).select(
        (F.col("pos") + 1).alias("centroid_id"),
        F.col("s.v").alias("centroid"),
    )


def _nearest_centroids(
    vec: Column,
    centroids: Column,
    n: int,
    dim: int | None = None,
    vec_norm: Column | None = None,
) -> Column:
    """Top-n centroid ids by 6dp-rounded cosine (ties → lowest centroid_id),
    from an array<struct<centroid_id,centroid>> (optionally carrying a
    pre-computed per-centroid ``_cn`` norm field).

    Scores are rounded so the ordering is reproducible across engines
    (summation-order float noise stays below the rounding quantum).

    ``vec_norm``: pre-computed ``sqrt(vec·vec)``. Without it, every centroid
    lane re-derives the row vector's norm (``n_centroids`` redundant
    dim-length folds per row); hoisting it into the per-row projection is the
    same float op sequence evaluated once — bit-identical scores. When set,
    the centroid structs must carry a pre-computed ``_cn`` norm field (see
    :func:`_cent_array`)."""

    def score(c):
        if vec_norm is not None and dim:
            return F.round(
                _dot_auto(vec, c["centroid"], dim) / (vec_norm * c["_cn"]), 6
            )
        return F.round(cosine(vec, c["centroid"], dim), 6)

    scored = F.transform(
        centroids,
        lambda c: F.struct(
            score(c).alias("s"),
            (-c["centroid_id"]).alias("neg_cid"),
            c["centroid_id"].alias("cid"),
        ),
    )
    # array_sort asc on (s, neg_cid), reversed => s desc, cid asc on ties.
    return F.slice(F.reverse(F.array_sort(scored)), 1, n)


def _cent_array(centroids: DataFrame, dim: int | None) -> DataFrame:
    """Centroids collected to ONE broadcastable array row, sorted by
    centroid_id. With a known ``dim`` each struct carries ``_cn`` — the
    centroid norm computed once per centroid (instead of once per corpus row
    × centroid inside the assignment lambda); identical float op sequence to
    the inline ``_norm``, so scores are bit-identical."""
    cols = [F.col("centroid_id"), F.col("centroid")]
    if dim:
        cols.append(
            F.sqrt(
                _dot_auto(F.col("centroid"), F.col("centroid"), dim)
            ).alias("_cn")
        )
    return centroids.agg(
        F.array_sort(F.collect_list(F.struct(*cols))).alias("cents")
    )


def ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid (bucket column).

    With ``dim`` set the per-row assignment hoists both norms (same float
    op order — bit-identical buckets), the corpus side is fan_out-spread
    first so a one-file corpus does not assign on a single task, and the
    output CARRIES the per-vector ``_vn`` norm so :func:`ivf_search` reuses
    it instead of re-deriving norms per scored candidate."""
    cent_arr = F.broadcast(_cent_array(centroids, dim))
    src = fan_out(corpus.select(id_col, vec_col), key=id_col)
    if dim:
        src = src.withColumn(
            "_vn", F.sqrt(_dot_auto(F.col(vec_col), F.col(vec_col), dim))
        )
    best = _nearest_centroids(
        F.col(vec_col),
        F.col("cents"),
        1,
        dim,
        vec_norm=F.col("_vn") if dim else None,
    )[0]
    return (
        src.crossJoin(cent_arr)
        .withColumn("_best", best)
        .select(
            F.col(id_col),
            F.col(vec_col),
            *([F.col("_vn")] if dim else []),
            F.col("_best.cid").alias("bucket"),
        )
    )


def refine_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_bits: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Lloyd (k-means) refinement of the sampled centroids: assign → mean per
    bucket → new centroids. The query path (``ivf_index``/``ivf_search``) is
    unchanged — refinement only moves the centroids so buckets balance and
    probes recall more true neighbors.

    Plan shape per iteration: one assignment pass (broadcast centroids, no
    shuffle), then the element-wise mean via ``posexplode`` →
    ``groupBy(bucket, pos)`` — partial aggregation reduces each task to
    k×dim rows before the shuffle, so the exchanged volume is centroid-sized,
    not corpus-sized. Empty buckets keep their previous centroid.

    ``quantize_bits``: compute each mean over ``floor(v · 2^bits)`` integer
    sums instead of float avg — every operation (power-of-two multiply,
    floor, integer sum, one final division) is exact binary arithmetic, so
    the refined centroids are bit-identical across engines/summation orders
    (the cross-engine-oracle mode; float avg is summation-order dependent).
    At 20 bits the quantization error per component is < 1e-6 — far below
    the 6dp score rounding the search uses.
    """
    for _ in range(n_iters):
        assigned = ivf_index(corpus, centroids, id_col=id_col, vec_col=vec_col, dim=dim)
        exploded = assigned.select(
            "bucket", F.posexplode(vec_col).alias("pos", "val")
        )
        if quantize_bits is None:
            per_pos = exploded.groupBy("bucket", "pos").agg(
                F.avg(F.col("val").cast("double")).alias("m")
            )
        else:
            scale = float(1 << quantize_bits)
            per_pos = (
                exploded.groupBy("bucket", "pos")
                .agg(
                    F.sum(
                        F.floor(F.col("val").cast("double") * F.lit(scale))
                    ).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .select(
                    "bucket",
                    "pos",
                    (F.col("s").cast("double") / (F.col("n") * F.lit(scale))).alias("m"),
                )
            )
        means = (
            per_pos.groupBy("bucket")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("new_centroid")
            )
        )
        centroids = (
            centroids.alias("c")
            .join(
                F.broadcast(means).alias("m"),
                F.col("c.centroid_id") == F.col("m.bucket"),
                "left",
            )
            .select(
                F.col("c.centroid_id").alias("centroid_id"),
                F.coalesce(F.col("m.new_centroid"), F.col("c.centroid")).alias(
                    "centroid"
                ),
            )
        )
    return centroids


def ivf_search(
    index: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: probe the n_probe nearest centroid buckets only."""
    cent_arr = F.broadcast(_cent_array(centroids, dim))
    q_src = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    if dim:
        q_src = q_src.withColumn(
            "_qn", F.sqrt(_dot_auto(F.col("q_vec"), F.col("q_vec"), dim))
        )
    probes = (
        q_src.crossJoin(cent_arr)
        .select(
            "query_id",
            "q_vec",
            *(["_qn"] if dim else []),
            F.explode(
                F.transform(
                    _nearest_centroids(
                        F.col("q_vec"),
                        F.col("cents"),
                        n_probe,
                        dim,
                        vec_norm=F.col("_qn") if dim else None,
                    ),
                    lambda s: s["cid"],
                )
            ).alias("bucket"),
        )
    )
    # With ``dim`` the index rows carry ``_vn`` and the probes ``_qn``:
    # score reuses both pre-computed norms — same float op order as
    # ``cosine`` (dot / (norm(q) * norm(v))), bit-identical scores, one dot
    # per candidate instead of three.
    if dim and "_vn" in index.columns:
        score = F.round(
            _dot_auto(F.col("q_vec"), F.col(vec_col), dim)
            / (F.col("_qn") * F.col("_vn")),
            6,
        )
    else:
        score = F.round(cosine(F.col("q_vec"), F.col(vec_col), dim), 6)
    scored = (
        index.join(F.broadcast(probes), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            score.alias("score"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


# ------------------------------------------------------- embedding near-dups


def _hyperplane(dim: int, j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane j (driver-side, tiny).

    The planes are embedded as LITERALS in both the Spark plan and the SQL
    oracle text, so any engine replays the identical bucketing.
    """
    import numpy as np

    rng = np.random.default_rng(1000 + j)
    v = rng.standard_normal(dim)
    return [round(float(x), 6) for x in v]


def cosine_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate embedding pairs: sign-LSH bucket join + exact cosine.

    Two vectors land in the same bucket iff they agree on every hyperplane
    sign — high-cosine pairs collide with high probability; the exact cosine
    filter removes false positives (no false negatives for identical
    vectors; raise n_planes to trade recall for candidate volume).

    Skew note: a hard-clustered corpus can put a large fraction of documents
    in one sign-bucket, making the in-bucket verify quadratic on one join
    key. A deterministic bucket sub-salting variant (left side salted, right
    side replicated s ways, join on (bucket, sub)) was prototyped and
    MEASURED 5-20x SLOWER at every tried configuration on this corpus — the
    identical-sides self-join below shares one exchange and one evaluation
    of the upstream embedding stage, while every salted variant either
    doubles the upstream work (asymmetric sides), forces a broadcast-probe
    plan, or evaluates the pushed-down score condition on the s-times-larger
    candidate stream. Revisit only with profiler evidence that one bucket's
    verify actually dominates a task.
    """
    planes = [_hyperplane(dim, j) for j in range(n_planes)]
    # Plane dots are 6dp-rounded before the sign test so the bucket string is
    # reproducible across engines (float summation noise stays below the
    # rounding quantum); the exact-cosine verify is rounded the same way.
    # The plane dots stay the higher-order fold on purpose: unrolled literal
    # folds cost n_planes × dim py4j round-trips per query BUILD (measured
    # seconds at dim=64) while the interpreted eval is off the critical path
    # once fan_out spreads the corpus scan.
    sig = F.concat_ws(
        "",
        *[
            F.when(
                F.round(_dot(F.col(vec_col), F.array(*[F.lit(x) for x in p])), 6)
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in planes
        ],
    )
    # The vector norm is hoisted into the PER-SIDE projection: Catalyst pushes
    # the score filter into the bucket join's condition, so anything written
    # per-pair runs once per bucket-collision CANDIDATE — and a skewed bucket
    # makes that quadratic. Norms are per-vector; computing them here turns
    # three interpreted array aggregates per candidate into one (the a·b dot),
    # identical float op sequence (sqrt then multiply, as cosine() does).
    # The cheap _id< conjunct is listed first so the short-circuit skips the
    # dot on the mirrored half of each collision. fan_out spreads the sig
    # computation when the corpus arrives as a 1-task scan (no-op at scale).
    tagged = fan_out(corpus.select(id_col, vec_col), key=id_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), sig.alias("bucket")
    ).withColumn(
        "_norm", F.sqrt(_dot_auto(F.col("_v"), F.col("_v"), dim))
    )
    score = F.round(
        _dot_auto(F.col("a._v"), F.col("b._v"), dim)
        / (F.col("a._norm") * F.col("b._norm")),
        6,
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    joined = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a._id") < F.col("b._id")),
    )
    return (
        joined.select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            score.alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
