"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: F.zip_with + F.aggregate — stays JVM-side,
  no UDF, linear scan; the correctness baseline.
- sign-LSH ANN: 8-bit random-hyperplane surrogate (sign of the leading
  dims) buckets the vectors; search only the query's bucket. The scale
  path: bucket key is the shuffle/partition key, so a 100 TB table
  becomes per-bucket partitions and the probe touches one of 256.
- IVF-style coarse quantization: centroids from the label column (or any
  k-means exterior loop), assign by argmin distance — the building block
  for IVF partitioned vector search.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def norm2(a) -> Column:
    return dot(a, a)


def cosine(a, b) -> Column:
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))


def query_vector(df: DataFrame, vec_id: int, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """1-row DataFrame with the query vector, for broadcast cross-join —
    keeps the whole top-k in one Catalyst DAG (no literal plumbing)."""
    return (df.filter(F.col(id_col) == vec_id)
            .select(F.col(vec_col).alias("q")))


def cosine_topk(df: DataFrame, query: DataFrame, k: int = 20,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine vs the (broadcast) query vector.

    Deterministic under float jitter: rank on the *rounded* cosine with
    id tiebreak, so engine-vs-oracle agree at the k boundary.
    """
    scored = (df.crossJoin(F.broadcast(query))
              .withColumn("cos", F.round(cosine(F.col(vec_col), F.col("q")), 6)))
    return (scored.orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "cos"))


def auto_bits(n_vectors: int, target_occupancy: int = 1024,
              min_bits: int = 4, max_bits: int = 24) -> int:
    """Scale the sign-LSH bucket width to the corpus.

    A fixed 8-bit key means 256 buckets forever: per-bucket pair volume
    in the near-dup join grows as (n/256)², which stops being a
    blocking scheme long before 100 TB. Choosing bits ≈ log2(n /
    target_occupancy) keeps expected bucket size ~constant, so the
    verify-join cost stays ~n·occupancy regardless of corpus size
    (e.g. 1e9 vectors @ occupancy 1024 → 20 bits → ~1M buckets).
    Callers pass a known/estimated count — at ingest this is a metastore
    row count, not a Spark action.
    """
    import math
    if n_vectors <= target_occupancy:
        return min_bits
    return max(min_bits, min(max_bits,
                             math.ceil(math.log2(n_vectors / target_occupancy))))


def sign_bucket(vec_col, bits: int = 8, offset: int = 0) -> Column:
    """LSH bucket id: sign bits of dimensions [offset, offset+bits).

    ``offset`` selects a disjoint dimension band, which makes the
    multi-table (banded OR) construction possible — same role as the
    row bands in dedup.minhash_lsh."""
    acc = F.lit(0)
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    for i in range(bits):
        acc = acc + F.when(F.element_at(col, offset + i + 1) > 0,
                           F.lit(1 << i)).otherwise(F.lit(0))
    return acc.cast("int")


def ann_sign_lsh_topk(df: DataFrame, query: DataFrame, k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      bits: int = 8) -> DataFrame:
    """Approximate top-k: restrict the scan to the query's sign bucket."""
    bucketed = df.withColumn("bucket", sign_bucket(vec_col, bits))
    qb = query.withColumn("bucket", sign_bucket("q", bits)) \
              .select("bucket", "q")
    cand = bucketed.join(F.broadcast(qb), "bucket")
    scored = cand.withColumn("cos", F.round(cosine(F.col(vec_col), F.col("q")), 6))
    return (scored.orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "bucket", "cos"))


def ann_multiprobe_topk(df: DataFrame, query: DataFrame, k: int = 10,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        bits: int = 8) -> DataFrame:
    """Multi-probe sign-LSH: probe the query's bucket plus every
    Hamming-distance-1 bucket (flip one sign bit) — 9 of 256 buckets for
    8 bits. The standard recall/cost knob for LSH at scale: recall rises
    sharply (near neighbours differ in few sign bits) while the scan
    still touches a constant fraction of the table; the probe list is a
    broadcast, so the plan is one hash join on the bucket key."""
    bucketed = df.withColumn("bucket", sign_bucket(vec_col, bits))
    qb = query.withColumn("qb", sign_bucket("q", bits))
    probes = qb.select(
        "q", F.explode(F.array(
            F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << i))
                           for i in range(bits)])).alias("bucket"))
    cand = bucketed.join(F.broadcast(probes), "bucket")
    scored = cand.withColumn("cos", F.round(cosine(F.col(vec_col), F.col("q")), 6))
    return (scored.orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "bucket", "cos"))


def quantize_int8(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = round(x_i / scale) ∈ [-127, 127] — the 4× storage shrink every
    100 TB vector corpus applies before indexing. All higher-order
    array functions, JVM-side."""
    mx = F.array_max(F.transform(vec_col, lambda x: F.abs(x.cast("double"))))
    quant = F.transform(
        vec_col,
        lambda x: F.when(F.lit(True) & (mx > 0),
                         F.round(x.cast("double") * 127.0 / mx, 0).cast("int")
                         ).otherwise(F.lit(0)))
    return df.select(F.col(id_col),
                     F.round(mx / 127.0, 9).alias("scale"),
                     quant.alias("qvec"))


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.30,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         bits: int = 8) -> DataFrame:
    """Embedding near-duplicate pairs, LSH-blocked.

    Candidates = pairs sharing the same sign-LSH bucket (random-hyperplane
    surrogate: sign bits of the leading `bits` dims); exact cosine is then
    verified on candidates only. The bucket key is the shuffle key, so the
    join is a hash join over ~n²/2^bits pairs instead of an all-pairs
    BroadcastNestedLoopJoin — the shape that survives 100 TB. Threshold is
    applied to the *rounded* cosine (oracle-parity convention).

    High-cosine pairs agree on most coordinate signs, so same-bucket
    blocking has high recall at meaningful thresholds (multi-probe /
    banded variants trade recall for cost; see dedup.minhash_lsh for the
    banded pattern).
    """
    bucketed = df.select(F.col(id_col), F.col(vec_col),
                         sign_bucket(vec_col, bits).alias("bucket"))
    a = bucketed.select(F.col(id_col).alias("vec_a"),
                        F.col(vec_col).alias("ea"), "bucket")
    b = bucketed.select(F.col(id_col).alias("vec_b"),
                        F.col(vec_col).alias("eb"), "bucket")
    cand = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    cos = F.round(cosine(F.col("ea"), F.col("eb")), 6)
    return (cand.withColumn("cos", cos)
            .filter(F.col("cos") >= threshold)
            .select("vec_a", "vec_b", "cos"))


def cosine_neardup_pairs_banded(df: DataFrame, threshold: float = 0.30,
                                bands: int = 2, bits_per_band: int = 8,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding") -> DataFrame:
    """Multi-table (banded) sign-LSH near-dup pairs — the recall upgrade
    over single-bucket blocking, mirroring dedup.minhash_lsh's banded
    OR-construction: each band hashes a DISJOINT slice of dimensions,
    and a pair becomes a candidate if it agrees on ANY band (vs ALL
    bits of the single table). Recall for a pair with per-dim sign
    agreement p rises from p^b to 1-(1-p^k)^bands.

    Plan shape: posexplode to (band, bucket) rows → self-join on the
    compound (band, bucket) key (shuffle key, hash join) → distinct id
    pairs → join embeddings back by id → exact cosine verify. The
    distinct runs on bare id pairs (no arrays), and the verify joins
    are id-equi-joins, so every stage shuffles narrow rows only."""
    banded = df.select(
        F.col(id_col),
        F.posexplode(F.array(*[
            sign_bucket(vec_col, bits_per_band, offset=b * bits_per_band)
            for b in range(bands)])).alias("band", "bucket"))
    a = banded.select(F.col(id_col).alias("vec_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("vec_b"), "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b").distinct())
    ea = df.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea"))
    eb = df.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb"))
    scored = (cand.join(ea, "vec_a").join(eb, "vec_b")
              .withColumn("cos", F.round(cosine(F.col("ea"), F.col("eb")), 6)))
    return (scored.filter(F.col("cos") >= threshold)
            .select("vec_a", "vec_b", "cos"))


def _two_phase_topk(scored: DataFrame, k: int, q_id_col: str,
                    id_col: str) -> DataFrame:
    """Shared two-phase top-k over a (q_id, id, cos) scored stream:
    partial top-k inside each scan partition (window keyed by (query,
    partition id)), then the global top-k over the k*parts survivors —
    the few-groups-skew dodge both the exact and bucketed batch k-NN
    joins rely on. ONE definition so their tiebreaks cannot drift."""
    from pyspark.sql import Window as W
    part = scored.withColumn("_p", F.spark_partition_id())
    w1 = W.partitionBy(q_id_col, "_p").orderBy(F.col("cos").desc(),
                                               F.col(id_col).asc())
    partial = (part.withColumn("_rn", F.row_number().over(w1))
               .filter(F.col("_rn") <= k))
    w2 = W.partitionBy(q_id_col).orderBy(F.col("cos").desc(),
                                         F.col(id_col).asc())
    return (partial.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select(q_id_col, id_col, "cos", "rank"))


def knn_join(df: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q",
             pair_filter=None) -> DataFrame:
    """Batch k-NN join: exact top-k corpus neighbours for EVERY query in
    a (small) query batch — the bulk-retrieval primitive behind
    retrieval-augmented dataset construction.

    Scale shape: the query batch is broadcast, so scoring is map-side —
    one pass over the corpus, the big table never shuffles for the join.
    Top-k then runs in TWO phases: a partial top-k inside each scan
    partition (window keyed by (query, partition id) — spread over the
    whole cluster), then the global top-k over the k·n_partitions
    survivors. A single-phase window would funnel every scored row onto
    |queries| reducers — the classic few-groups skew; the two-phase plan
    carries O(k·parts) rows per query into the final shuffle instead of
    the whole corpus. Approximate variants (sign-LSH buckets, IVF lists)
    bound the *scored* set the same way s02/s04 do.

    ``pair_filter``: optional Column predicate over (corpus row x query
    row) applied before scoring — e.g. a label-mismatch constraint for
    hard-negative mining. It prunes map-side, inside the same pass.
    """
    scored = (df.crossJoin(F.broadcast(queries))
              .filter(F.col(id_col) != F.col(q_id_col)))
    if pair_filter is not None:
        scored = scored.filter(pair_filter)
    scored = (scored
              .withColumn("cos", F.round(
                  cosine(F.col(vec_col), F.col(q_vec_col)), 6))
              .select(q_id_col, id_col, "cos"))
    return _two_phase_topk(scored, k, q_id_col, id_col)


def label_centroids(df: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-label mean vector via posexplode + groupBy — the coarse
    quantizer codebook (IVF lists)."""
    d = (df.select(label_col, F.posexplode(vec_col).alias("pos", "val"))
         .groupBy(label_col, "pos")
         .agg(F.avg(F.col("val").cast("double")).alias("avg_val")))
    return (d.groupBy(label_col)
            .agg(F.array_sort(F.collect_list(F.struct("pos", "avg_val")))
                 .alias("_s"))
            .withColumn("centroid", F.transform("_s", lambda s: s["avg_val"]))
            .select(label_col, "centroid"))


def assign_nearest_centroid(df: DataFrame, centroids: DataFrame,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            label_col: str = "label") -> DataFrame:
    """Assign each vector to the nearest (squared-L2) centroid —
    broadcast the codebook, argmin via row_number."""
    from pyspark.sql import Window as W
    cent = centroids.select(F.col(label_col).alias("cand_label"), "centroid")
    joined = df.crossJoin(F.broadcast(cent))
    d2 = F.aggregate(
        F.zip_with(vec_col, "centroid",
                   lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0), lambda acc, v: acc + v)
    return (joined.withColumn("_d2", F.round(d2, 9))
            .withColumn("_rn", F.row_number().over(
                W.partitionBy(id_col).orderBy(F.col("_d2").asc(),
                                              F.col("cand_label").asc())))
            .filter(F.col("_rn") == 1)
            .select(id_col, F.col(label_col),
                    F.col("cand_label").alias("assigned_label"),
                    F.col("_d2").alias("dist2")))


def pq_encode(df: DataFrame, m: int = 4, k: int = 8, iterations: int = 2,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """Product quantization (Jégou et al., PAMI 2011): split each vector
    into ``m`` contiguous subspaces, learn an independent k-centroid
    codebook per subspace with the deterministic k-means loop
    (datapipe/kmeans.py), and encode every vector as ``m`` small codes.
    Returns (codes, codebooks): codes has one row per vector with
    columns code_0..code_{m-1}; codebooks maps subspace -> centroids
    DataFrame. Memory story at scale: a 64-dim float vector (256 B)
    compresses to m bytes (m=4: 64x), and ANN distance evaluation
    becomes m table lookups — the standard billion-vector recipe.
    The m per-subspace loops are a constant-count driver iteration
    (L3, same shape as kmeans/dorling); each join back on the id is a
    thin two-column shuffle."""
    from ecmm428_pycart_spark.datapipe.kmeans import kmeans_grouped

    dim = len(df.select(vec_col).first()[0])   # planning-time constant
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_d = dim // m
    # one exploded frame carrying every subspace: the m codebooks train
    # CONCURRENTLY in kmeans_grouped (one broadcast join + one
    # aggregation per Lloyd iteration for all m, instead of m
    # sequential kmeans loops — m x fewer jobs, identical results)
    subs = df.select(
        id_col,
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("_sub"),
                     F.slice(vec_col, j * sub_d + 1, sub_d)
                     .alias("embedding"))
            for j in range(m)])).alias("_e")) \
        .select(id_col, F.col("_e._sub").alias("_sub"),
                F.col("_e.embedding").alias("embedding"))
    assigned, cents = kmeans_grouped(subs, k=k, iterations=iterations,
                                     group_col="_sub", id_col=id_col,
                                     vec_col="embedding")
    codes = (assigned.groupBy(id_col)
             .agg(*[F.max(F.when(F.col("_sub") == j, F.col("cluster")))
                    .cast("int").alias(f"code_{j}") for j in range(m)]))
    codebooks = {j: cents.filter(F.col("_sub") == j)
                 .select("cluster", "centroid") for j in range(m)}
    return codes, codebooks


def pq_reconstruction_error(df: DataFrame, codes: DataFrame,
                            codebooks: dict, m: int = 4,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Per-vector squared reconstruction error of the PQ encoding
    (sum over subspaces of ||sub - centroid||^2) — the quality metric
    a codebook build is judged by. Broadcast codebooks, one thin join
    per subspace."""
    dim = len(df.select(vec_col).first()[0])
    sub_d = dim // m
    out = df.join(codes, id_col)
    err = F.lit(0.0)
    for j in range(m):
        cb = codebooks[j].select(
            F.col("cluster").alias(f"code_{j}"),
            F.col("centroid").alias(f"_cb_{j}"))
        out = out.join(F.broadcast(cb), f"code_{j}")
        sub = F.slice(vec_col, j * sub_d + 1, sub_d)
        err = err + F.aggregate(
            F.zip_with(sub, f"_cb_{j}",
                       lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, v: acc + v)
    return out.select(id_col, err.alias("sq_err"))


def pq_adc_topk(df: DataFrame, query: DataFrame, k: int = 20,
                m: int = 4, k_codes: int = 8, iterations: int = 2,
                shortlist: int = 500, id_col: str = "vec_id",
                vec_col: str = "embedding",
                q_col: str = "q") -> DataFrame:
    """PQ asymmetric-distance search with exact re-rank — the standard
    production ANN recipe (Jégou et al.): vectors are L2-normalized so
    squared-L2 order == cosine order, PQ codebooks are learned on the
    normalized corpus, the query is compared to CENTROIDS once (an
    m x k_codes distance table, broadcast everywhere), every vector's
    approximate distance is m table lookups (broadcast joins on the
    code columns — no shuffle over the corpus beyond the encode), the
    top-``shortlist`` by approximate distance are re-ranked with the
    exact cosine, and the final top-k is exact over that shortlist.
    Recall is governed by shortlist/m/k_codes; at 100 TB the corpus
    scan cost is reading m bytes per vector instead of the full
    embedding.

    Single-query contract (same as cosine_topk): the per-subspace
    distance tables are keyed on code_j only, so multiple query rows
    would mix distances arbitrarily — enforce one row up front."""
    query = query.limit(1)
    nrm = F.sqrt(F.aggregate(
        F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, v: a + v))
    dfn = df.select(
        id_col,
        F.transform(vec_col, lambda x: x.cast("double") / nrm)
        .alias("embedding"))
    codes, cbs = pq_encode(dfn, m=m, k=k_codes, iterations=iterations,
                           id_col=id_col, vec_col="embedding")

    qn = F.sqrt(F.aggregate(
        F.transform(q_col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, v: a + v))
    qdf = query.select(
        F.transform(q_col, lambda x: x.cast("double") / qn).alias("_qn"))
    dim_row = df.select(F.size(vec_col)).first()
    sub_d = dim_row[0] // m

    approx = codes
    dist = F.lit(0.0)
    for j in range(m):
        qsub = F.slice("_qn", j * sub_d + 1, sub_d)
        dtab = (cbs[j].crossJoin(F.broadcast(qdf))
                .select(F.col("cluster").alias(f"code_{j}"),
                        F.aggregate(
                            F.zip_with("centroid", qsub,
                                       lambda c, q: (c - q) * (c - q)),
                            F.lit(0.0), lambda a, v: a + v)
                        .alias(f"_d_{j}")))
        approx = approx.join(F.broadcast(dtab), f"code_{j}")
        dist = dist + F.col(f"_d_{j}")
    short = (approx.select(id_col, dist.alias("_approx"))
             .orderBy(F.col("_approx").asc(), F.col(id_col).asc())
             .limit(shortlist))

    cand = df.join(F.broadcast(short), id_col).select(id_col, vec_col)
    return cosine_topk(cand, query, k=k, id_col=id_col, vec_col=vec_col)


def ivf_pq_topk(df: DataFrame, query: DataFrame, k: int = 20,
                nprobe: int = 2, m: int = 8, k_codes: int = 8,
                shortlist: int = 2000, id_col: str = "vec_id",
                vec_col: str = "embedding",
                list_col: str = "label") -> DataFrame:
    """IVF + PQ-ADC + exact re-rank — the composed faiss-IVFPQ shape
    that serves billion-vector ANN in production: a coarse inverted
    index (here the label-centroid lists of s03/s04) cuts the corpus
    to ``nprobe`` lists, PQ asymmetric distance scans those lists at
    m bytes/vector, and the exact cosine re-ranks the shortlist. At
    100 TB the three stages multiply: read nprobe/nlist of the corpus,
    at (m/4d)x the bytes, shuffling nothing but the shortlist.

    Single-query contract (inherited from pq_adc_topk) — enforced
    HERE, before the probe-list computation, so the probed lists and
    the scored query can never come from different rows of a multi-row
    input (review finding r4). Deterministic end-to-end: centroids are
    exact per-list means, k-means (inside pq_encode) uses the fixed
    deterministic init, ties broken on id."""
    query = query.limit(1)
    cents = label_centroids(df, label_col=list_col, vec_col=vec_col)
    qv = query.select(F.col(query.columns[-1]).alias("_q")) \
        if "q" not in query.columns else query.select(F.col("q").alias("_q"))
    d2 = F.aggregate(
        F.zip_with("centroid", "_q",
                   lambda c, q: (c - q.cast("double"))
                   * (c - q.cast("double"))),
        F.lit(0.0), lambda a, v: a + v)
    probed = (cents.crossJoin(F.broadcast(qv))
              .select(F.col(list_col), d2.alias("_d2"))
              .orderBy(F.col("_d2").asc(), F.col(list_col).asc())
              .limit(nprobe)
              .select(list_col))
    cand = df.join(F.broadcast(probed), list_col)
    return pq_adc_topk(cand, query, k=k, m=m, k_codes=k_codes,
                       shortlist=shortlist, id_col=id_col,
                       vec_col=vec_col)


def semdedup(df: DataFrame, k: int = 8, iterations: int = 3,
             threshold: float = 0.95, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = k-means clustering + within-cluster cosine pruning.

    Matches the paper's published algorithm: cluster the embeddings,
    rank each cluster's members by cosine similarity TO THE CENTROID
    ascending (the paper keeps the example least like the centroid —
    the most "extreme" representative), and prune any example whose
    upper-triangular pairwise cosine against an EARLIER-ranked member
    reaches the threshold — regardless of whether that earlier member
    was itself pruned (exactly the paper's max-over-upper-triangle
    rule, not connected components).

    Deterministic for oracle/golden use: k-means is the deterministic
    exterior loop (datapipe.kmeans), ranks order on the ROUNDED
    centroid cosine with id tiebreak, and the prune test uses the
    rounded pairwise cosine (convention shared with
    cosine_neardup_pairs).

    Scale shape (the reason SemDeDup beats all-pairs at 100 TB): the
    only self-join is blocked on `cluster`, so pairwise work is
    sum(c_i^2) not n^2 — pick k ~ n/target so cluster sizes stay
    bounded (the paper uses 50k clusters for LAION-440M); the join key
    is the shuffle key, centroids broadcast, and the final keep test
    is a broadcast-able anti-join on bare ids.

    Returns (id, cluster, cent_cos, keep) — `keep == False` rows are
    the semantic duplicates to drop.
    """
    from pyspark.sql import Window as W

    from ecmm428_pycart_spark.datapipe.kmeans import kmeans

    assigned, centroids = kmeans(df, k=k, iterations=iterations,
                                 id_col=id_col, vec_col=vec_col)
    # assignments carry (id, cluster) only — join the vectors back
    assigned = assigned.select(id_col, "cluster").join(
        df.select(id_col, vec_col), id_col)
    cent = centroids.select("cluster", "centroid")
    ranked = (assigned.join(F.broadcast(cent), "cluster")
              .withColumn("cent_cos",
                          F.round(cosine(F.col(vec_col),
                                         F.col("centroid")), 6))
              .withColumn("rk", F.row_number().over(
                  W.partitionBy("cluster")
                  .orderBy(F.col("cent_cos").asc(), F.col(id_col).asc())))
              .select(id_col, vec_col, "cluster", "cent_cos", "rk")
              # ranked feeds BOTH sides of the pairwise join and the
              # final keep join; without this the cluster-sort +
              # row_number re-executes three times per action (the same
              # pattern kmeans checkpoints for)
              .localCheckpoint(eager=True))
    a = ranked.select(F.col(id_col).alias("_ida"),
                      F.col(vec_col).alias("_ea"),
                      "cluster", F.col("rk").alias("_rka"))
    b = ranked.select(F.col(id_col).alias("_idb"),
                      F.col(vec_col).alias("_eb"),
                      "cluster", F.col("rk").alias("_rkb"))
    pruned = (a.join(b, "cluster")
              .filter(F.col("_rka") < F.col("_rkb"))
              .withColumn("_cos",
                          F.round(cosine(F.col("_ea"), F.col("_eb")), 6))
              .filter(F.col("_cos") >= threshold)
              .select(F.col("_idb").alias(id_col))
              .distinct())
    return (ranked.select(id_col, "cluster", "cent_cos")
            .join(pruned.withColumn("_p", F.lit(True)), id_col, "left")
            .withColumn("keep", F.col("_p").isNull())
            .drop("_p"))


def _safe_cosine(a, b) -> Column:
    """cosine() that maps a zero-norm side to -2.0 (below any real
    cosine) instead of ANSI's DIVIDE_BY_ZERO / non-ANSI's NaN."""
    return F.coalesce(
        F.try_divide(dot(a, b), F.sqrt(norm2(a)) * F.sqrt(norm2(b))),
        F.lit(-2.0))


def truncated_rerank_topk(df: DataFrame, query: DataFrame, k: int = 20,
                          coarse_dims: int = 8, shortlist: int = 100,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Two-phase exact top-k with a truncated-dimension coarse pass —
    the Matryoshka-representation serving pattern (Kusupati et al.
    2022): phase 1 scores every vector on only the LEADING
    ``coarse_dims`` dimensions (reading/computing d/coarse_dims fewer
    bytes per row — with MRL-trained embeddings the prefix is a valid
    low-d embedding), keeps a ``shortlist``; phase 2 re-ranks the
    shortlist with full-dimension cosine. Unlike PQ-ADC (quantized
    phase 1) this coarse pass is exact over the prefix, so recall
    degrades only as much as the prefix disagrees with the full space.

    Contract mirrors cosine_topk: single-query (enforced), rounded
    scores with id tiebreaks at both phase boundaries, deterministic.
    Phase 1 is a TakeOrderedAndProject (per-partition bottom-k +
    merge, no global sort); phase 2 touches ``shortlist`` rows only.
    """
    query = query.limit(1)
    qv = query.select(F.col(query.columns[-1]).alias("_q")) \
        if "q" not in query.columns else query.select(F.col("q").alias("_q"))
    # try_divide + coalesce: an all-zero prefix makes the coarse
    # cosine 0/0, which under ANSI (Spark 4 default) is a
    # DIVIDE_BY_ZERO task kill, and with ANSI off a NaN that sorts
    # ABOVE every real value descending and floods the shortlist.
    # Null it out and rank it below any real cosine instead.
    coarse = F.round(_safe_cosine(
        F.slice(F.col(vec_col), 1, coarse_dims),
        F.slice(F.col("_q"), 1, coarse_dims)), 6)
    short = (df.select(id_col, vec_col)
             .crossJoin(F.broadcast(qv))
             .withColumn("_coarse", coarse)
             .orderBy(F.col("_coarse").desc(), F.col(id_col).asc())
             .limit(shortlist))
    exact = F.round(_safe_cosine(F.col(vec_col), F.col("_q")), 6)
    return (short.withColumn("cos", exact)
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "cos"))


def semdedup_auto_k(n_vectors: int, target_cluster_size: int = 1024,
                    min_k: int = 4, max_k: int = 1 << 20) -> int:
    """The k knob for semdedup at scale, mirroring auto_bits: constant
    expected cluster size keeps the within-cluster pairwise work at
    ~n * target per pass instead of n²/k with a fixed k (the measured
    growth in SCALING.md's queued-op curves). The paper's 50k clusters
    for 440M embeddings is this rule at target ≈ 8.8k."""
    if n_vectors <= target_cluster_size * min_k:
        return min_k
    return min(max_k, -(-n_vectors // target_cluster_size))  # ceil


def rrf_fuse(rankings: list[DataFrame], k: int = 10, c: int = 60,
             id_col: str = "doc_id") -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) — the standard way
    to combine heterogeneous retrievers (BM25 postings + dense ANN)
    into one hybrid ranking without score calibration:

        rrf(d) = sum over lists containing d of 1 / (c + rank_i(d))

    Each input is (id, <score col>) — its LAST column is taken as the
    score, ranked descending with the id tiebreak (the convention every
    retriever in this package emits). Missing-from-a-list contributes
    nothing. Ranks are computed per list with a window over the
    (small, already top-k'd) candidate lists — fusion cost is
    O(sum of list lengths), independent of corpus size; rrf rounded
    to 6 for cross-engine parity.
    """
    if not rankings:
        raise ValueError("rrf_fuse: no rankings")
    from pyspark.sql import Window as W

    contribs = []
    for r in rankings:
        score = F.col(r.columns[-1])
        contribs.append(
            r.select(F.col(id_col), score.alias("_s"))
            .withColumn("_rank", F.row_number().over(
                W.orderBy(F.col("_s").desc(), F.col(id_col).asc())))
            .select(id_col,
                    (1.0 / (F.lit(c) + F.col("_rank"))).alias("_rrf")))
    allc = contribs[0]
    for other in contribs[1:]:
        allc = allc.unionByName(other)
    return (allc.groupBy(id_col)
            .agg(F.round(F.sum("_rrf"), 6).alias("rrf"))
            .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
            .limit(k))


def mmr_topk(df: DataFrame, query: DataFrame, k: int = 10,
             shortlist: int = 100, lam: float = 0.5,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): pick k results balancing query relevance against redundancy
    with what's already picked —

        MMR = argmax_d [ lam * cos(d, q)
                         - (1 - lam) * max_{s in S} cos(d, s) ]

    Two-phase, the way every production retrieval stack runs it: the
    DISTRIBUTED phase is an exact cosine shortlist (broadcast query,
    one pass, TakeOrdered — cosine_topk's plan) that bounds the
    candidate set; the greedy selection then runs on the driver over
    those <= ``shortlist`` vectors (the same bounded-single-result
    contract as pq_adc_topk's single-query collect — this is a
    per-query kernel, not a corpus pass). Scores are rounded to 6
    before comparison with smallest-id tiebreaks, so the selection is
    engine- and layout-deterministic.

    Returns (rank 1..k, id, cos, mmr) in selection order. ``lam=1``
    degenerates to pure relevance (= cosine_topk order).
    """
    import numpy as np

    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    if k > shortlist:
        raise ValueError("k cannot exceed the shortlist size")
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"rank int, {id_col} {id_type}, cos double, mmr double"
    cand = (df.crossJoin(F.broadcast(query))
            .withColumn("cos", F.round(cosine(F.col(vec_col), F.col("q")), 6))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(shortlist)
            .select(id_col, vec_col, "cos")
            .collect())
    if not cand:
        return df.sparkSession.createDataFrame([], out_schema)
    ids = [r[id_col] for r in cand]
    rel = np.array([r["cos"] for r in cand])
    x = np.array([np.asarray(r[vec_col], dtype=np.float64) for r in cand])
    nrm = np.linalg.norm(x, axis=1)
    nrm[nrm == 0] = 1.0
    xn = x / nrm[:, None]
    sims = np.round(xn @ xn.T, 6)  # candidate-candidate cosines
    picked, max_sim = [], np.full(len(cand), -np.inf)
    avail = np.ones(len(cand), dtype=bool)
    out = []
    for rank in range(1, min(k, len(cand)) + 1):
        if picked:
            mmr = np.round(lam * rel - (1 - lam) * max_sim, 6)
        else:
            mmr = np.round(lam * rel, 6)
        mmr_masked = np.where(avail, mmr, -np.inf)
        best = mmr_masked.max()
        # smallest id among ties
        tie = [i for i in np.flatnonzero(mmr_masked == best)]
        j = min(tie, key=lambda i: ids[i])
        picked.append(j)
        avail[j] = False
        out.append((rank, ids[j], float(rel[j]), float(mmr[j])))
        max_sim = np.maximum(max_sim, sims[j])
    return df.sparkSession.createDataFrame(out, out_schema)


def hard_negatives(df: DataFrame, anchors: DataFrame | None = None,
                   k: int = 5, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Hard-negative mining for contrastive training: for every anchor,
    the k most-similar corpus vectors with a DIFFERENT label — the
    negatives that actually teach a metric model something (Schroff et
    al. 2015's semi-hard insight, batch form).

    Pure composition: ``knn_join`` with a label-mismatch
    ``pair_filter``, so the corpus never shuffles (anchors broadcast,
    mismatch pruned map-side, two-phase top-k). ``anchors`` defaults to
    the corpus rows themselves — pass a small sampled frame at real
    scale (the broadcast bound is the anchor count, exactly knn_join's
    contract). Returns (q_id, a_label, vec_id, cos, rank).
    """
    if anchors is None:
        anchors = df
    q = anchors.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).alias("q"),
                       F.col(label_col).alias("a_label"))
    out = knn_join(df, q, k=k, id_col=id_col, vec_col=vec_col,
                   pair_filter=F.col(label_col) != F.col("a_label"))
    # re-attach the anchor label (broadcast of the same small frame)
    return (out.join(F.broadcast(q.select("q_id", "a_label")), "q_id")
            .select("q_id", "a_label", id_col, "cos", "rank"))


def ann_knn_join(df: DataFrame, queries: DataFrame, k: int = 5,
                 bits: int = 8, id_col: str = "vec_id",
                 vec_col: str = "embedding", q_id_col: str = "q_id",
                 q_vec_col: str = "q") -> DataFrame:
    """Approximate batch k-NN: each query scores ONLY its sign-LSH
    bucket — the bounded-scan batch sibling of ``ann_sign_lsh_topk``
    and the scale path ``knn_join``'s docstring promises. The corpus
    is bucketed once (native sign bits); the bucketed query batch
    broadcasts, so the join is a hash join on the bucket key touching
    ~n/2^bits rows per query instead of n; the two-phase partial
    top-k then mirrors the exact join. Recall follows the s02/s07
    story (near neighbours agree on most leading sign bits; widen
    with multiprobe or more tables when it matters). Returns
    (q_id, id, cos, rank).
    """
    bucketed = df.withColumn("bucket", sign_bucket(vec_col, bits))
    qb = queries.withColumn("bucket", sign_bucket(q_vec_col, bits))
    scored = (bucketed.join(F.broadcast(qb), "bucket")
              .filter(F.col(id_col) != F.col(q_id_col))
              .withColumn("cos", F.round(
                  cosine(F.col(vec_col), F.col(q_vec_col)), 6))
              .select(q_id_col, id_col, "cos"))
    return _two_phase_topk(scored, k, q_id_col, id_col)


def normalize_embeddings(df: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Per-dimension z-score standardization — the feature-scaling
    step run before k-means / PCA / brute-force distance so no single
    high-variance dimension dominates the metric.

    Plan shape (scales without exploding the corpus twice): the
    per-dimension (mean, stddev_pop) table comes from ONE
    posexplode + groupBy(pos) pass with map-side partial aggregation
    (dims x partitions partials, never corpus-sized shuffles); those
    d rows are collapsed into two position-ordered ARRAYS in a 1-row
    aggregate and broadcast back, so the normalization itself is a
    map-side ``transform`` over the original (un-exploded) vector
    column. Stats are rounded to 6 before use — both engines then
    standardize with bit-identical constants (the oracle-parity
    convention), and a zero-variance dimension maps to z = 0 rather
    than dividing by zero.

    Returns (id, zvec) with zvec the standardized vector; gate queries
    reduce it to scalars (array outputs don't gate).
    """
    ex = df.select(F.posexplode(F.col(vec_col)).alias("pos", "v"))
    st = (ex.groupBy("pos")
          .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("m"),
               F.round(F.stddev_pop(F.col("v").cast("double")), 6)
               .alias("s")))
    arrs = st.agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda t: t["m"]).alias("_m_arr"),
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda t: t["s"]).alias("_s_arr"))
    z = F.transform(
        F.col(vec_col),
        lambda x, i: F.coalesce(
            F.try_divide(x.cast("double") - F.element_at("_m_arr", i + 1),
                         F.element_at("_s_arr", i + 1)),
            F.lit(0.0)))
    return (df.join(F.broadcast(arrs))
            .select(F.col(id_col), z.alias("zvec")))


def save_kmeans_index(assigned: DataFrame, centroids: DataFrame,
                      path: str, id_col: str = "vec_id") -> None:
    """Persist a trained IVF index (k-means assignments + centroids)
    as parquet — build once, serve many: the separation every
    production ANN stack has between the (expensive, iterative)
    index-build job and the (cheap, map-side) query path.
    Assignments are partitioned by cluster so a probe reads only the
    lists it visits; centroids are a k-row table the query side
    broadcasts."""
    (assigned.select(id_col, "cluster")
     .write.mode("overwrite").partitionBy("cluster")
     .parquet(f"{path}/assignments"))
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def load_kmeans_index(spark, path: str):
    """Load a save_kmeans_index artifact: (assignments, centroids)."""
    return (spark.read.parquet(f"{path}/assignments"),
            spark.read.parquet(f"{path}/centroids"))


def ivf_topk_from_index(vectors: DataFrame, assigned: DataFrame,
                        centroids: DataFrame, query: DataFrame,
                        k: int = 5, nprobe: int = 1,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Serve an IVF top-k FROM A LOADED INDEX: nearest ``nprobe``
    centroid lists by exact L2 (k-row broadcast, cluster-id tiebreak),
    then exact cosine over only those lists' members — the vectors
    table contributes the probed lists' rows via a broadcast semi-ish
    join on the persisted assignments, so the scan is corpus/nlist
    sized. Deterministic: rounded cosine, id tiebreaks (the
    cosine_topk convention)."""
    query = query.limit(1)
    qv = (query.select(F.col(query.columns[-1]).alias("_q"))
          if "q" not in query.columns
          else query.select(F.col("q").alias("_q")))
    d2 = F.aggregate(
        F.zip_with("centroid", "_q",
                   lambda c, q: (c - q.cast("double"))
                   * (c - q.cast("double"))),
        F.lit(0.0), lambda a, v: a + v)
    probed = (centroids.crossJoin(F.broadcast(qv))
              .select("cluster", d2.alias("_d2"))
              .orderBy(F.col("_d2").asc(), F.col("cluster").asc())
              .limit(nprobe)
              .select("cluster"))
    members = (assigned.join(F.broadcast(probed), "cluster")
               .select(id_col, "cluster"))
    cand = vectors.join(members, id_col)
    scored = (cand.crossJoin(F.broadcast(qv))
              .withColumn("cos", F.round(
                  cosine(F.col(vec_col), F.col("_q")), 6)))
    return (scored.orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "cluster", "cos"))


def sign_pack(vec_col: str, bits: int = 63) -> Column:
    """1-bit (sign) quantization of a float vector packed into ONE
    BIGINT: bit i set iff dimension i > 0. The 64-byte-per-vector ->
    8-byte compression behind binary / Hamming retrieval (the
    "binary quantization" serving tier offered by every vector store).

    ``bits`` caps at 63: setting bit 63 is 1<<63, which overflows the
    signed 64-bit domain both engines share (DuckDB raises on the
    shift) — with 64-dim embeddings the last dimension is simply not
    coded, an accepted 1/64 information loss for this tier. Built as a
    native fold (sum of disjoint powers of two — no carries, so
    addition == bitwise OR); zero Python, map-side only."""
    if not 1 <= bits <= 63:
        raise ValueError("bits must be in [1, 63]")
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc + IF(element_at({vec_col}, i + 1) > "
        f"CAST(0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i), "
        f"CAST(0 AS BIGINT)))")


def binary_hamming_topk(df: DataFrame, query: DataFrame, k: int = 10,
                        shortlist: int = 20, bits: int = 63,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Binary-quantized ANN: Hamming distance over sign_pack codes
    bounds a ``shortlist``, exact cosine re-ranks it — the
    coarse-then-exact pattern of truncated_rerank_topk with an 8-byte
    phase-1 payload (bit_count(xor) is one popcount instruction per
    candidate; at 100 TB the code column is 64x smaller than the
    vector column, so phase 1 is I/O-bound on 1/64th the bytes).

    Phase 1 is a TakeOrderedAndProject (per-partition top-k + merge,
    no global sort); phase 2 touches ``shortlist`` rows. Deterministic:
    integer Hamming with id tiebreak at the shortlist boundary, rounded
    cosine with id tiebreak at k."""
    query = query.limit(1)
    qv = (query.select(F.col(query.columns[-1]).alias("_q"))
          if "q" not in query.columns
          else query.select(F.col("q").alias("_q")))
    qv = qv.select("_q", sign_pack("_q", bits).alias("_qcode"))
    short = (df.select(id_col, vec_col)
             .withColumn("_code", sign_pack(vec_col, bits))
             .crossJoin(F.broadcast(qv))
             .withColumn("hamming",
                         F.bit_count(F.col("_code")
                                     .bitwiseXOR(F.col("_qcode")))
                         .cast("long"))
             .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
             .limit(shortlist))
    return (short.withColumn("cos", F.round(
                _safe_cosine(F.col(vec_col), F.col("_q")), 6))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "hamming", "cos"))


def grouped_cosine_topk(df: DataFrame, query: DataFrame, k: int = 3,
                        group_col: str = "label",
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """FACETED retrieval: exact top-k by cosine vs the broadcast
    query WITHIN each group — the per-source/per-language/per-shard
    diversity quota pattern (a global top-k returns one dominant
    facet; serving layers want the best k from EVERY facet and blend
    downstream). Same determinism contract as ``cosine_topk``: rank
    on the rounded cosine with id tiebreak.

    Execution shape: one broadcast, one map-side score pass, one
    row_number window PARTITIONED BY the group (never global) —
    per-facet top-k costs what the groupBy it replaces costs."""
    from pyspark.sql import Window as W

    scored = (df.crossJoin(F.broadcast(query))
              .withColumn("cos",
                          F.round(cosine(F.col(vec_col), F.col("q")),
                                  6)))
    w = (W.partitionBy(group_col)
         .orderBy(F.col("cos").desc(), F.col(id_col).asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(group_col, "rank", id_col, "cos"))
