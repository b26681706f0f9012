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


def _norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(_dot_static(a, a, dim) if dim else _dot(a, a))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity; pass ``dim`` when the vector width is statically
    known to evaluate via the unrolled codegen fold (same float op sequence
    as the interpreted higher-order aggregate — see :func:`_dot_static` —
    so scores are bitwise identical either way)."""
    num = _dot_static(a, b, dim) if dim else _dot(a, b)
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
    c = corpus.select(
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
    vec: Column, centroids: Column, n: int, dim: int | None = None
) -> Column:
    """Top-n centroid ids by 6dp-rounded cosine (ties → lowest centroid_id),
    from an array<struct<centroid_id,centroid>>.

    Scores are rounded so the ordering is reproducible across engines
    (summation-order float noise stays below the rounding quantum)."""
    scored = F.transform(
        centroids,
        lambda c: F.struct(
            F.round(cosine(vec, c["centroid"], dim), 6).alias("s"),
            (-c["centroid_id"]).alias("neg_cid"),
            c["centroid_id"].alias("cid"),
        ),
    )
    # array_sort asc on (s, neg_cid), reversed => s desc, cid asc on ties.
    return F.slice(F.reverse(F.array_sort(scored)), 1, n)


def ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid (bucket column)."""
    cent_arr = F.broadcast(
        centroids.agg(
            F.array_sort(
                F.collect_list(F.struct("centroid_id", "centroid"))
            ).alias("cents")
        )
    )
    return (
        corpus.crossJoin(cent_arr)
        .withColumn(
            "_best", _nearest_centroids(F.col(vec_col), F.col("cents"), 1, dim)[0]
        )
        .select(
            F.col(id_col),
            F.col(vec_col),
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
    cent_arr = F.broadcast(
        centroids.agg(
            F.array_sort(
                F.collect_list(F.struct("centroid_id", "centroid"))
            ).alias("cents")
        )
    )
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .crossJoin(cent_arr)
        .select(
            "query_id",
            "q_vec",
            F.explode(
                F.transform(
                    _nearest_centroids(F.col("q_vec"), F.col("cents"), n_probe, dim),
                    lambda s: s["cid"],
                )
            ).alias("bucket"),
        )
    )
    scored = (
        index.join(F.broadcast(probes), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("q_vec"), F.col(vec_col), dim), 6).alias("score"),
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
    """
    planes = [_hyperplane(dim, j) for j in range(n_planes)]
    # Plane dots are 6dp-rounded before the sign test so the bucket string is
    # reproducible across engines (float summation noise stays below the
    # rounding quantum); the exact-cosine verify is rounded the same way.
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
    # dot on the mirrored half of each collision.
    tagged = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), sig.alias("bucket")
    ).withColumn(
        "_norm", F.sqrt(_dot_static(F.col("_v"), F.col("_v"), dim))
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    score = F.round(
        _dot_static(F.col("a._v"), F.col("b._v"), dim)
        / (F.col("a._norm") * F.col("b._norm")),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            score.alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
