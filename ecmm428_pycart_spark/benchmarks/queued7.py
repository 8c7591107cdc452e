"""Round-7 registration queue — overflow of benchmarks/queued6.py,
which is capped at 48 entries (the 50-slot gate window minus the two
rotation sentinels: round 6 registers queued6 and defers it to round
7's window, so queued6 CANNOT exceed the deferred budget). Entries
here follow the identical contract — oracle beside the query, the
tests/test_queued7_queries.py gate replica, scalar outputs, plan
guards — and register in round 7 by the same mechanical recipe
(collect module, defer to round 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ecmm428_pycart_spark.session import load_table as _t

QUERIES = {}
ORACLES = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        ORACLES[name] = sql
        return fn
    return deco


# ---------------------------------------------------------------------------
# Bounded weighted shortest paths (graph.bounded_shortest_paths):
# 4 synchronous Bellman-Ford relaxations from the sparse seed set
# over the queen grid with INTEGER edge weights 1 + (u + v) % 5 —
# the weighted sibling of g20's BFS (cost-to-reach, not hop count).
# Pure integer min-plus algebra, so the oracle unrolls every
# relaxation in SQL (the g19/g22 discipline: closed-form grid edges,
# no golden). Page: the distance histogram + distance mass, fully
# deterministic.
# ---------------------------------------------------------------------------
_G26_ROUND = """
r{i} AS (
  SELECT k, min(d) AS d FROM (
    SELECT k, d FROM r{j}
    UNION ALL
    SELECT u.b AS k, r.d + u.w AS d
    FROM und u JOIN r{j} r ON r.k = u.a
  ) GROUP BY k
)"""


@q("g26_weighted_paths", f"""
WITH p AS (
  SELECT CAST(ceiling(sqrt(count(*))) AS BIGINT) AS side FROM customer
),
g AS (
  SELECT c_custkey AS k, c_custkey % side AS gx, c_custkey // side AS gy
  FROM customer, p
),
e AS (
  SELECT a.k AS a, b.k AS b, 1 + (a.k + b.k) % 5 AS w
  FROM g a JOIN g b
    ON (a.k < b.k AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1)
),
und AS (SELECT a, b, w FROM e UNION ALL SELECT b AS a, a AS b, w FROM e),
r0 AS (SELECT k, 0 AS d FROM g WHERE k % 97 = 0),
{_G26_ROUND.format(i=1, j=0)},
{_G26_ROUND.format(i=2, j=1)},
{_G26_ROUND.format(i=3, j=2)},
{_G26_ROUND.format(i=4, j=3)}
SELECT CAST(d AS BIGINT) AS dist,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(d * 1) AS BIGINT) AS dist_mass
FROM r4 GROUP BY d ORDER BY dist
""")
def g26_weighted_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.benchmarks.geo_queries import _customer_grid
    from ecmm428_pycart_spark.datapipe.graph import bounded_shortest_paths
    from ecmm428_pycart_spark.operators.borders import get_borders

    grid = _customer_grid(spark, sf_dir).drop("value")
    borders, _ = get_borders(grid, "region_idx", "geometry",
                             idx_field="region_idx")
    e = borders.select(
        F.col("focal").alias("src"), F.col("neighbor").alias("dst"),
        (1 + (F.col("focal") + F.col("neighbor")) % 5).alias("w"))
    seeds = (grid.select(F.col("region_idx").alias("node"))
             .filter(F.col("node") % 97 == 0))
    out = bounded_shortest_paths(e, seeds, rounds=4)
    return (out.groupBy(F.col("dist").cast("long").alias("dist"))
            .agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.sum("dist").cast("long").alias("dist_mass"))
            .orderBy("dist"))


# ---------------------------------------------------------------------------
# REAL safetensors walk (multimodal.decode_safetensors_manifest):
# u64-LE header length + JSON tensor directory + one contiguous
# buffer — THE tensor interchange format training stacks ship
# weights and preprocessed features in. The decoder verifies every
# span against shape * itemsize and that spans tile the buffer
# exactly (gaps/overlaps raise); fixtures carry an I32 [4,8] and an
# I64 [6] tensor per doc with closed-form values the oracle
# recomputes, layout_ok pinned for every doc.
# ---------------------------------------------------------------------------
@q("m36_safetensors_stats", """
WITH p AS (SELECT doc_id, source FROM documents),
emb AS (
  SELECT doc_id, sum((3 * doc_id + i.i) % 1000) AS s
  FROM p, unnest(range(0, 32)) i(i) GROUP BY doc_id
),
ids AS (
  SELECT doc_id, sum(7 * doc_id + i.i) AS s
  FROM p, unnest(range(0, 6)) i(i) GROUP BY doc_id
)
SELECT p.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) * 2 AS BIGINT) AS n_tensors,
       CAST(count(*) * 38 AS BIGINT) AS total_elems,
       CAST(sum(emb.s + ids.s) AS BIGINT) AS total_sum,
       CAST(count(*) AS BIGINT) AS n_layout_ok
FROM p JOIN emb USING (doc_id) JOIN ids USING (doc_id)
GROUP BY p.source
""")
def m36_safetensors_stats(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe import multimodal

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    st = (docs.withColumn(
              "payload",
              multimodal.synth_safetensors_payload(F.col("doc_id")))
          .withColumn("s",
                      multimodal.safetensors_stats(F.col("payload"))))
    return (st.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("s.n_tensors").cast("long").alias("n_tensors"),
                 F.sum("s.total_elems").cast("long")
                 .alias("total_elems"),
                 F.sum("s.total_sum").cast("long").alias("total_sum"),
                 F.sum(F.col("s.layout_ok").cast("long"))
                 .alias("n_layout_ok")))


# ---------------------------------------------------------------------------
# Dataset snapshot diff (operators.snapshot_diff): the corpus drift
# report between releases — v2 is derived IN-PLAN from v1 (every
# 31st doc deleted, every 13th survivor revised, every 41st doc
# re-added under a new id), then ONE full outer join on the key over
# map-side 16-byte content digests labels every row added / removed /
# changed / unchanged. The oracle recomputes the per-source status
# histogram directly from the id arithmetic — the diff operator and
# the expected-counts formulas never share logic.
# ---------------------------------------------------------------------------
@q("d68_snapshot_diff", """
WITH v1 AS (SELECT doc_id, source, text FROM documents),
st AS (
  SELECT source,
         CASE WHEN doc_id % 31 = 0 THEN 'removed'
              WHEN doc_id % 13 = 0 THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM v1
  UNION ALL
  SELECT source, 'added' AS status
  FROM v1 WHERE doc_id % 41 = 0
)
SELECT source, status, CAST(count(*) AS BIGINT) AS n
FROM st GROUP BY source, status ORDER BY source, status
""")
def d68_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.operators.relational import snapshot_diff

    v1 = _t(spark, sf_dir, "documents").select("doc_id", "source",
                                               "text")
    survivors = (v1.filter(F.col("doc_id") % 31 != 0)
                 .withColumn("text",
                             F.when(F.col("doc_id") % 13 == 0,
                                    F.concat(F.col("text"),
                                             F.lit(" [rev2]")))
                             .otherwise(F.col("text"))))
    newdocs = (v1.filter(F.col("doc_id") % 41 == 0)
               .withColumn("doc_id", F.col("doc_id") + 1000000))
    v2 = survivors.unionByName(newdocs)
    d = snapshot_diff(v1, v2, "doc_id", ["text"])
    src = (v1.select("doc_id", "source")
           .unionByName(newdocs.select("doc_id", "source")).distinct())
    return (d.join(src, "doc_id")
            .groupBy("source", "status")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("source", "status"))


# ---------------------------------------------------------------------------
# Canonical URL dedup (text.with_canonical_url): crawl-side URL
# normalization — casefolded scheme/host, scheme-default ports
# stripped (http:80 / https:443; other ports real), trailing path
# slash dropped except root, fragments discarded, tracking params
# (utm_*, fbclid, gclid, mc_*) removed, surviving params SORTED.
# Fixture URLs are built in-plan across five axes (scheme case,
# host case, port class, trailing slash, param order + tracking) so
# byte-distinct spellings collapse. CROSS-PARSER oracle: Spark uses
# java parse_url, DuckDB replays with regexp + list machinery —
# agreement over the axes is the check. Page: per-source raw vs
# canonical distinct counts + a canonical-string checksum.
# ---------------------------------------------------------------------------
@q("d69_canonical_url", """
WITH u0 AS (
  SELECT source,
         CASE doc_id % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTP'
              ELSE 'https' END
         || '://'
         || CASE doc_id % 2 WHEN 0 THEN 'Example.COM'
                 ELSE 'example.com' END
         || CASE doc_id % 4 WHEN 1 THEN ':80' WHEN 2 THEN ':8080'
                 WHEN 3 THEN ':443' ELSE '' END
         || '/p' || doc_id % 5
         || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
         || CASE WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=x&a=1'
                 ELSE '?a=1&b=2' END
         || CASE WHEN doc_id % 3 = 0 THEN '#sec' ELSE '' END AS url
  FROM documents
),
c AS (
  SELECT source, url,
         lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS proto,
         regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1) AS hostport,
         regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)
           AS rawpath,
         regexp_extract(url, '\\?([^#]*)', 1) AS q
  FROM u0
),
c2 AS (
  SELECT source, url, proto,
         lower(regexp_replace(hostport, ':[0-9]+$', '')) AS host,
         regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
         CASE WHEN rawpath = '' THEN '/' ELSE rawpath END AS p1,
         array_to_string(list_sort(list_filter(
             string_split(q, '&'),
             x -> x <> '' AND NOT (starts_with(x, 'utm_')
                  OR starts_with(x, 'fbclid=')
                  OR starts_with(x, 'gclid=')
                  OR starts_with(x, 'mc_cid=')
                  OR starts_with(x, 'mc_eid=')))), '&') AS params
  FROM c
),
canon AS (
  SELECT source, url,
         proto || '://' || host
         || CASE WHEN port <> ''
                  AND NOT (proto = 'http' AND port = '80')
                  AND NOT (proto = 'https' AND port = '443')
                 THEN ':' || port ELSE '' END
         || CASE WHEN len(p1) > 1 AND p1 LIKE '%/'
                 THEN substr(p1, 1, len(p1) - 1) ELSE p1 END
         || CASE WHEN params <> '' THEN '?' || params ELSE '' END
           AS cu
  FROM c2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT url) AS BIGINT) AS n_distinct_raw,
       CAST(count(DISTINCT cu) AS BIGINT) AS n_distinct_canon,
       CAST(sum(CAST(concat('0x', substr(md5(cu), 1, 12)) AS BIGINT))
            AS BIGINT) AS canon_checksum
FROM canon GROUP BY source
""")
def d69_canonical_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.text import with_canonical_url

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    url = F.concat(
        F.element_at(F.array(F.lit("http"), F.lit("HTTP"),
                             F.lit("https")),
                     (F.col("doc_id") % 3 + 1).cast("int")),
        F.lit("://"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("Example.COM"))
        .otherwise(F.lit("example.com")),
        F.element_at(F.array(F.lit(""), F.lit(":80"), F.lit(":8080"),
                             F.lit(":443")),
                     (F.col("doc_id") % 4 + 1).cast("int")),
        F.lit("/p"), (F.col("doc_id") % 5).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0,
               F.lit("?b=2&utm_source=x&a=1"))
        .otherwise(F.lit("?a=1&b=2")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("#sec"))
        .otherwise(F.lit("")))
    d = with_canonical_url(docs.withColumn("url", url), "url")
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("url").alias("n_distinct_raw"),
                 F.countDistinct("canon_url")
                 .alias("n_distinct_canon"),
                 F.sum(F.conv(F.substring(F.md5("canon_url"), 1, 12),
                              16, 10).cast("long"))
                 .cast("long").alias("canon_checksum")))


# ---------------------------------------------------------------------------
# Cohort retention matrix (the product-analytics staple q93/q100
# skirt): users cohorted by FIRST-activity week, then each (cohort,
# week-offset) cell counts distinct users active that many weeks
# later, with floor-div ppm retention against the cohort size.
# Weeks are epoch-day div 7 (calendar-agnostic, engine-identical —
# no week-of-year locale trap). Two shuffles total: the per-user
# first-week aggregate, then the cell count; retention joins the
# 1-row-per-cohort sizes back broadcast-style.
# ---------------------------------------------------------------------------
@q("q106_cohort_retention", """
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
first_wk AS (SELECT user_id, min(wk) AS cohort FROM act GROUP BY user_id),
sz AS (SELECT cohort, count(*) AS n_cohort FROM first_wk GROUP BY cohort),
cell AS (
  SELECT f.cohort, a.wk - f.cohort AS week_offset,
         count(DISTINCT a.user_id) AS n_active
  FROM act a JOIN first_wk f USING (user_id)
  GROUP BY 1, 2
)
SELECT CAST(c.cohort AS BIGINT) AS cohort_week,
       CAST(c.week_offset AS BIGINT) AS week_offset,
       CAST(c.n_active AS BIGINT) AS n_active,
       CAST(s.n_cohort AS BIGINT) AS n_cohort,
       CAST(c.n_active * 1000000 // s.n_cohort AS BIGINT)
         AS retention_ppm
FROM cell c JOIN sz s USING (cohort)
ORDER BY cohort_week, week_offset
""")
def q106_cohort_retention(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    ev = (_t(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull()
                  & F.col("ts").isNotNull()))
    act = (ev.select("user_id",
                     F.floor(F.unix_timestamp(
                         F.col("ts").cast("timestamp")) / 604800)
                     .cast("long").alias("wk"))
           .distinct())
    first_wk = act.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    sz = first_wk.groupBy("cohort").agg(F.count(F.lit(1))
                                        .alias("n_cohort"))
    cell = (act.join(first_wk, "user_id")
            .groupBy("cohort",
                     (F.col("wk") - F.col("cohort"))
                     .alias("week_offset"))
            .agg(F.count_distinct("user_id").alias("n_active")))
    return (cell.join(sz, "cohort")
            .select(F.col("cohort").cast("long").alias("cohort_week"),
                    F.col("week_offset").cast("long")
                    .alias("week_offset"),
                    F.col("n_active").cast("long").alias("n_active"),
                    F.col("n_cohort").cast("long").alias("n_cohort"),
                    F.expr("n_active * 1000000 div n_cohort")
                    .cast("long").alias("retention_ppm"))
            .orderBy("cohort_week", "week_offset"))


# ---------------------------------------------------------------------------
# ViT-style patchify (multimodal.gray_patch_means): REAL PNG decode
# -> non-overlapping 4x4 tiles -> exact integer tile means (sum div
# 16) — the patch-embedding precursor of every vision-training
# pipeline. The patch array folds to scalars MAP-SIDE (plain sum +
# a position-weighted sum that catches any patch-order permutation
# the plain sum would survive); the oracle recomputes both from the
# generative pixel algebra over an unnested (patch, dx, dy) grid.
# ---------------------------------------------------------------------------
@q("m37_patch_means", """
WITH p AS (
  SELECT doc_id, source, doc_id % 7 + 1 AS a, doc_id % 5 + 1 AS b
  FROM documents
),
tile AS (
  SELECT p.doc_id, p.source, py.py * 4 + px.px AS patch_idx,
         sum((a * (px.px * 4 + dx.dx) + b * (py.py * 4 + dy.dy))
             % 256) // 16 AS mean_v
  FROM p, unnest(range(0, 4)) py(py), unnest(range(0, 4)) px(px),
       unnest(range(0, 4)) dy(dy), unnest(range(0, 4)) dx(dx)
  GROUP BY 1, 2, 3
),
d AS (
  SELECT doc_id, source,
         sum(mean_v) AS s, sum((patch_idx + 1) * mean_v) AS ws
  FROM tile GROUP BY doc_id, source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) * 16 AS BIGINT) AS n_patches,
       CAST(sum(s) AS BIGINT) AS patch_sum,
       CAST(sum(ws) AS BIGINT) AS weighted_patch_sum
FROM d GROUP BY source
""")
def m37_patch_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe import multimodal

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    d = (docs.withColumn(
             "payload",
             multimodal.synth_patch_png_payload(F.col("doc_id")))
         .withColumn("m", multimodal.gray_patch_means(F.col("payload")))
         .select("source", F.size("m").alias("n_patches"),
                 F.expr("aggregate(m, 0L, (acc, x) -> acc + x)")
                 .alias("s"),
                 F.expr("aggregate(zip_with(m, sequence(1, size(m)), "
                        "(x, i) -> x * i), 0L, (acc, x) -> acc + x)")
                 .alias("ws")))
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_patches").cast("long").alias("n_patches"),
                 F.sum("s").cast("long").alias("patch_sum"),
                 F.sum("ws").cast("long").alias("weighted_patch_sum")))


# ---------------------------------------------------------------------------
# k-truss (graph.k_truss): EDGE-level cohesion — iteratively drop
# edges in fewer than k-2 triangles until stable (k-core's stronger
# sibling; the spam-ring / dense-cluster filter). Spark runs the
# support-count + filter loop with the k_core convergence probe; the
# oracle unrolls THREE support rounds in SQL over the closed-form
# queen-grid edges (convergence is round-2 at every tested sf, and
# extra unrolled rounds are no-ops once stable, so the fixed unroll
# equals the converged loop). Page: surviving/dropped edge counts,
# node count, and an edge-set checksum.
# ---------------------------------------------------------------------------
_G27_ROUND = """
u{i} AS (SELECT a, b FROM e{i} UNION ALL SELECT b AS a, a AS b FROM e{i}),
s{i} AS (
  SELECT e.a, e.b, count(*) AS c
  FROM e{i} e JOIN u{i} x ON x.a = e.a
  JOIN u{i} y ON y.a = e.b AND y.b = x.b
  GROUP BY e.a, e.b
),
e{n} AS (
  SELECT e.a, e.b FROM e{i} e
  LEFT JOIN s{i} s ON s.a = e.a AND s.b = e.b
  WHERE coalesce(s.c, 0) >= 2
)"""


@q("g27_k_truss", f"""
WITH p AS (
  SELECT CAST(ceiling(sqrt(count(*))) AS BIGINT) AS side FROM customer
),
g AS (
  SELECT c_custkey AS k, c_custkey % side AS gx, c_custkey // side AS gy
  FROM customer, p
),
e0 AS (
  SELECT a.k AS a, b.k AS b
  FROM g a JOIN g b
    ON (a.k < b.k AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1)
),
{_G27_ROUND.format(i=0, n=1)},
{_G27_ROUND.format(i=1, n=2)},
{_G27_ROUND.format(i=2, n=3)}
SELECT CAST((SELECT count(*) FROM e3) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM
             (SELECT a FROM e3 UNION SELECT b FROM e3)) AS BIGINT)
         AS n_nodes,
       CAST((SELECT count(*) FROM e0) -
            (SELECT count(*) FROM e3) AS BIGINT) AS n_dropped,
       CAST((SELECT sum(a * 100003 + b) FROM e3) AS BIGINT)
         AS edge_checksum
""")
def g27_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.benchmarks.geo_queries import _customer_grid
    from ecmm428_pycart_spark.datapipe.graph import k_truss
    from ecmm428_pycart_spark.operators.borders import get_borders

    grid = _customer_grid(spark, sf_dir).drop("value")
    borders, _ = get_borders(grid, "region_idx", "geometry",
                             idx_field="region_idx")
    e0 = (borders.select(F.least("focal", "neighbor").alias("a"),
                         F.greatest("focal", "neighbor").alias("b"))
          .distinct())
    final = k_truss(borders.select(F.col("focal").alias("src"),
                                   F.col("neighbor").alias("dst")),
                    k=4)
    nodes = (final.select("a").unionByName(
        final.select(F.col("b").alias("a"))).distinct())
    return (final.agg(F.count(F.lit(1)).alias("n_edges"),
                      F.sum(F.expr("a * 100003 + b")).cast("long")
                      .alias("edge_checksum"))
            .crossJoin(F.broadcast(
                nodes.agg(F.count(F.lit(1)).alias("n_nodes"))))
            .crossJoin(F.broadcast(
                e0.agg(F.count(F.lit(1)).alias("_n0"))))
            .select(F.col("n_edges").cast("long").alias("n_edges"),
                    F.col("n_nodes").cast("long").alias("n_nodes"),
                    (F.col("_n0") - F.col("n_edges")).cast("long")
                    .alias("n_dropped"),
                    F.col("edge_checksum")))


# ---------------------------------------------------------------------------
# Near-dup retention policy (dedup.retention_policy): AFTER d15's
# LSH -> verify -> connected-components clustering, decide WHICH copy
# survives — longest text, smallest id on ties (the keep-the-most-
# complete-copy rule; singletons survive trivially). The decision is
# one cluster-partitioned argmax window over the cluster map. The
# oracle extends d15's full SQL chain (minhash, banding, bucket cap,
# Jaccard verify, recursive-CTE components) with the same argmax, so
# every upstream stage AND the policy replay end-to-end.
# ---------------------------------------------------------------------------
def _d70_sql():
    from ecmm428_pycart_spark.benchmarks.datapipe_queries import (
        _BANDS_SQL, _MINHASH_SQL)
    from ecmm428_pycart_spark.datapipe import dedup
    d15 = f"""
WITH sig AS ({_MINHASH_SQL}),
bands0 AS (
{_BANDS_SQL}
),
bands AS (
  SELECT doc_id, band, band_key FROM bands0
  QUALIFY count(*) OVER (PARTITION BY band, band_key) <= {dedup.MAX_BUCKET_SIZE}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sets AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS s FROM documents
),
edges AS (
  SELECT doc_a, doc_b FROM (
    SELECT p.doc_a, p.doc_b,
           round(len(list_filter(sa.s, x -> list_contains(sb.s, x)))::DOUBLE
                 / (len(sa.s) + len(sb.s)
                    - len(list_filter(sa.s, x -> list_contains(sb.s, x)))), 4)
           AS jaccard
    FROM pairs p
    JOIN sets sa ON sa.doc_id = p.doc_a
    JOIN sets sb ON sb.doc_id = p.doc_b
  ) WHERE jaccard >= 0.5
),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM edges
  UNION
  SELECT doc_b, doc_a FROM edges
),
reach AS (
  WITH RECURSIVE r(a, b) AS (
    SELECT a, a FROM sym
    UNION
    SELECT r.a, s.b FROM r JOIN sym s ON r.b = s.a
  ) SELECT * FROM r
)
SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS component
FROM reach GROUP BY a
"""
    cut = d15.rindex("SELECT a AS doc_id")
    prefix = d15[:cut].rstrip().rstrip(",")
    return prefix + """,
cc AS (
  SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a
),
docs2 AS (
  SELECT d.doc_id, d.source, len(d.text) AS L,
         coalesce(cc.component, d.doc_id) AS comp
  FROM documents d LEFT JOIN cc USING (doc_id)
),
keep AS (
  SELECT source, doc_id, L, comp,
         row_number() OVER (PARTITION BY comp
                            ORDER BY L DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY comp) AS csz
  FROM docs2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clustered,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN rn = 1 THEN L ELSE 0 END) AS BIGINT)
         AS chars_kept,
       CAST(sum(L) AS BIGINT) AS chars_total
FROM keep GROUP BY source
"""


@q("d70_retention_policy", _d70_sql())
def d70_retention_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe import band_store, dedup
    from ecmm428_pycart_spark.datapipe.components import (
        connected_components)

    docs = _t(spark, sf_dir, "documents")
    # MinHash+banding served from the write-once band store
    pairs = band_store.candidate_pairs(spark, sf_dir)
    edges = dedup.jaccard_pairs(docs, pairs, threshold=0.5)
    cc = connected_components(edges).select(
        F.col("node").alias("doc_id"), "component")
    pol = dedup.retention_policy(docs, cc)
    sz = pol.groupBy("cluster").agg(F.count(F.lit(1)).alias("_csz"))
    d = (pol.join(sz, "cluster")
         .join(docs.select("doc_id", "source",
                           F.length("text").alias("_L")), "doc_id"))
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("_csz") > 1).cast("long"))
                 .alias("n_clustered"),
                 F.sum(F.col("keep").cast("long")).alias("n_kept"),
                 F.sum(F.when(F.col("keep"), F.col("_L"))
                       .otherwise(F.lit(0))).cast("long")
                 .alias("chars_kept"),
                 F.sum("_L").cast("long").alias("chars_total")))


# ---------------------------------------------------------------------------
# Embedding drift monitor (s27's cross-release sibling): per-label
# centroid shift between two embedding snapshots, in EXACT integer
# space — components floor-quantize to 1e-4 (engine-deterministic),
# the second snapshot is derived in-plan by shifting every fifth
# vector's quantized components (+100 * (dim % 3)), and drift is
# the L1 / max over dims of the per-dim centroid-SUM differences
# (sums, not means — no division, no float). The re-embedding
# regression gate every retrieval pipeline wants before swapping an
# encoder. One (label, dim) aggregate per snapshot, one join.
# ---------------------------------------------------------------------------
@q("s29_embedding_drift", """
WITH q1 AS (
  SELECT label, vec_id, pos,
         CAST(floor(val::DOUBLE * 10000) AS BIGINT) AS xq
  FROM (SELECT label, vec_id, unnest(embedding) AS val,
               unnest(range(1, 65)) AS pos
        FROM embeddings)
),
q2 AS (
  SELECT label, vec_id, pos,
         xq + CASE WHEN vec_id % 5 = 0
                   THEN 100 * ((pos - 1) % 3) ELSE 0 END AS xq
  FROM q1
),
c1 AS (SELECT label, pos, sum(xq) AS s FROM q1 GROUP BY label, pos),
c2 AS (SELECT label, pos, sum(xq) AS s FROM q2 GROUP BY label, pos),
n AS (SELECT label, count(DISTINCT vec_id) AS n_vecs,
             count(DISTINCT CASE WHEN vec_id % 5 = 0
                                 THEN vec_id END) AS n_shifted
      FROM q1 GROUP BY label)
SELECT CAST(n.label AS BIGINT) AS label,
       CAST(n.n_vecs AS BIGINT) AS n_vecs,
       CAST(n.n_shifted AS BIGINT) AS n_shifted,
       CAST(sum(abs(c2.s - c1.s)) AS BIGINT) AS l1_drift,
       CAST(max(abs(c2.s - c1.s)) AS BIGINT) AS max_dim_drift
FROM n JOIN c1 ON c1.label = n.label
JOIN c2 ON c2.label = c1.label AND c2.pos = c1.pos
GROUP BY n.label, n.n_vecs, n.n_shifted
ORDER BY label
""")
def s29_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q1 = (emb.select("label", "vec_id",
                     F.posexplode("embedding").alias("pos0", "val"))
          .select("label", "vec_id",
                  (F.col("pos0") + 1).alias("pos"),
                  F.floor(F.col("val").cast("double") * 10000)
                  .cast("long").alias("xq")))
    q2 = q1.withColumn(
        "xq",
        F.col("xq") + F.when(F.col("vec_id") % 5 == 0,
                             100 * ((F.col("pos") - 1) % 3))
        .otherwise(F.lit(0)))
    c1 = q1.groupBy("label", "pos").agg(F.sum("xq").alias("s1"))
    c2 = q2.groupBy("label", "pos").agg(F.sum("xq").alias("s2"))
    n = (q1.groupBy("label")
         .agg(F.count_distinct("vec_id").alias("n_vecs"),
              F.count_distinct(F.when(F.col("vec_id") % 5 == 0,
                                      F.col("vec_id")))
              .alias("n_shifted")))
    d = (c1.join(c2, ["label", "pos"])
         .groupBy("label")
         .agg(F.sum(F.abs(F.col("s2") - F.col("s1")))
              .alias("l1_drift"),
              F.max(F.abs(F.col("s2") - F.col("s1")))
              .alias("max_dim_drift")))
    return (n.join(d, "label")
            .select(F.col("label").cast("long").alias("label"),
                    F.col("n_vecs").cast("long").alias("n_vecs"),
                    F.col("n_shifted").cast("long").alias("n_shifted"),
                    F.col("l1_drift").cast("long").alias("l1_drift"),
                    F.col("max_dim_drift").cast("long")
                    .alias("max_dim_drift"))
            .orderBy("label"))


# ---------------------------------------------------------------------------
# Hash-random walk corpus (graph.hash_random_walks): DeepWalk's
# input stage — per-seed walks whose next hop is the neighbor
# minimizing md5(walk:step:neighbor), i.e. md5-RNG transitions that
# are a pure function of (graph, seeds, steps) and therefore
# replayable: the oracle unrolls every argmin step in SQL with the
# identical 40-bit-hash * 2^22 + node pack. Page: per-step walk
# count, node-id checksum and distinct-node coverage over the queen
# grid from the node % 29 seed set.
# ---------------------------------------------------------------------------
_G28_STEP = """
w{t} AS (
  SELECT walk_id, min(CAST(concat('0x',
           substr(md5(walk_id || ':{t}:' || u.b), 1, 10)) AS BIGINT)
         * 4194304 + u.b) % 4194304 AS node
  FROM w{p} w JOIN und u ON u.a = w.node
  GROUP BY walk_id
)"""


@q("g28_hash_walks", f"""
WITH p AS (
  SELECT CAST(ceiling(sqrt(count(*))) AS BIGINT) AS side FROM customer
),
g AS (
  SELECT c_custkey AS k, c_custkey % side AS gx, c_custkey // side AS gy
  FROM customer, p
),
e AS (
  SELECT a.k AS a, b.k AS b
  FROM g a JOIN g b
    ON (a.k < b.k AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1)
),
und AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
w0 AS (SELECT k AS walk_id, k AS node FROM g WHERE k % 29 = 0),
{_G28_STEP.format(t=1, p=0)},
{_G28_STEP.format(t=2, p=1)},
{_G28_STEP.format(t=3, p=2)},
allw AS (
  SELECT walk_id, 0 AS step, node FROM w0
  UNION ALL SELECT walk_id, 1, node FROM w1
  UNION ALL SELECT walk_id, 2, node FROM w2
  UNION ALL SELECT walk_id, 3, node FROM w3
)
SELECT CAST(step AS BIGINT) AS step,
       CAST(count(*) AS BIGINT) AS n_walks,
       CAST(sum(node) AS BIGINT) AS node_checksum,
       CAST(count(DISTINCT node) AS BIGINT) AS n_distinct_nodes
FROM allw GROUP BY step ORDER BY step
""")
def g28_hash_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.benchmarks.geo_queries import _customer_grid
    from ecmm428_pycart_spark.datapipe.graph import hash_random_walks
    from ecmm428_pycart_spark.operators.borders import get_borders

    grid = _customer_grid(spark, sf_dir).drop("value")
    borders, _ = get_borders(grid, "region_idx", "geometry",
                             idx_field="region_idx")
    e = borders.select(F.col("focal").alias("src"),
                       F.col("neighbor").alias("dst"))
    seeds = (grid.select(F.col("region_idx").alias("node"))
             .filter(F.col("node") % 29 == 0))
    w = hash_random_walks(e, seeds, steps=3)
    return (w.groupBy(F.col("step").cast("long").alias("step"))
            .agg(F.count(F.lit(1)).alias("n_walks"),
                 F.sum("node").cast("long").alias("node_checksum"),
                 F.count_distinct("node").alias("n_distinct_nodes"))
            .orderBy("step"))


# ---------------------------------------------------------------------------
# Marketing attribution (first/last touch): per purchase conversion,
# credit the earliest and latest non-purchase channel inside a 7-day
# lookback — the q90-funnel sibling every growth stack reports.
# Determinism: the touch order key packs epoch-seconds * 2^32 +
# event_id into one BIGINT (unique, and it just fits: 1.7e9 * 2^32
# ~ 7.5e18 < 2^63), so max_by/min_by (Spark) and arg_max/arg_min
# (DuckDB) pick identical touches — never a bare timestamp with tie
# ambiguity. Conversions with an empty lookback credit '(none)'.
# Plan: one user-keyed interval join (bounded by per-user activity,
# the st06 shape) + one keyed argmax per side.
# ---------------------------------------------------------------------------
@q("q107_touch_attribution", """
WITH ev AS (
  SELECT user_id, event_id, event_type, ts,
         CAST(epoch(ts) AS BIGINT) * 4294967296 + event_id AS k
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
conv AS (SELECT * FROM ev WHERE event_type = 'purchase'),
touch AS (SELECT * FROM ev WHERE event_type <> 'purchase'),
att AS (
  SELECT c.event_id,
         coalesce(arg_max(t.event_type, t.k), '(none)') AS last_ch,
         coalesce(arg_min(t.event_type, t.k), '(none)') AS first_ch
  FROM conv c LEFT JOIN touch t
    ON t.user_id = c.user_id AND t.k < c.k
   AND t.ts >= c.ts - INTERVAL 7 DAY
  GROUP BY c.event_id
),
u AS (
  SELECT first_ch AS channel, 'first' AS kind FROM att
  UNION ALL SELECT last_ch, 'last' FROM att
)
SELECT channel,
       CAST(sum(CASE WHEN kind = 'first' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_first_credit,
       CAST(sum(CASE WHEN kind = 'last' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_last_credit
FROM u GROUP BY channel ORDER BY channel
""")
def q107_touch_attribution(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    ev = (_t(spark, sf_dir, "events")
          .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
          .withColumn("ts", F.col("ts").cast("timestamp"))
          .withColumn("k",
                      F.unix_timestamp("ts") * F.lit(4294967296)
                      + F.col("event_id")))
    conv = ev.filter(F.col("event_type") == "purchase")
    touch = ev.filter(F.col("event_type") != "purchase")
    j = conv.alias("c").join(
        touch.alias("t"),
        (F.col("t.user_id") == F.col("c.user_id"))
        & (F.col("t.k") < F.col("c.k"))
        & (F.col("t.ts") >= F.col("c.ts") - F.expr("INTERVAL 7 DAY")),
        "left")
    att = (j.groupBy(F.col("c.event_id").alias("event_id"))
           .agg(F.coalesce(F.max_by("t.event_type", "t.k"),
                           F.lit("(none)")).alias("last_ch"),
                F.coalesce(F.min_by("t.event_type", "t.k"),
                           F.lit("(none)")).alias("first_ch")))
    u = (att.select(F.col("first_ch").alias("channel"),
                    F.lit("first").alias("kind"))
         .unionByName(att.select(F.col("last_ch").alias("channel"),
                                 F.lit("last").alias("kind"))))
    return (u.groupBy("channel")
            .agg(F.sum((F.col("kind") == "first").cast("long"))
                 .alias("n_first_credit"),
                 F.sum((F.col("kind") == "last").cast("long"))
                 .alias("n_last_credit"))
            .orderBy("channel"))


# ---------------------------------------------------------------------------
# Keyed pseudonymization (text.pseudonymize): user ids replaced by
# salted-md5 handles — deterministic per (salt, id) so joins and
# distinct counts survive, non-invertible without the salt, and
# salt rotation re-keys the whole space (the GDPR erasure flow).
# The page pins the two contracts ONLINE: per event_type the
# pseudonym distinct count equals the raw distinct count (collision
# check at 12 hex chars), and a purchase-to-click self-join keyed on
# pseudonyms returns exactly the row count of the raw-keyed join
# (referential integrity preserved).
# ---------------------------------------------------------------------------
@q("d72_pseudonymize", """
WITH ev AS (
  SELECT event_type, user_id,
         'u_' || substr(md5('s1:' || CAST(user_id AS VARCHAR)), 1, 12)
           AS pseudo
  FROM events WHERE user_id IS NOT NULL
),
per AS (
  SELECT event_type,
         count(*) AS n_events,
         count(DISTINCT user_id) AS n_users,
         count(DISTINCT pseudo) AS n_pseudo
  FROM ev GROUP BY event_type
),
raw_j AS (
  SELECT count(*) AS n FROM
    (SELECT DISTINCT user_id FROM ev WHERE event_type = 'purchase') p
    JOIN (SELECT DISTINCT user_id FROM ev WHERE event_type = 'click') c
      USING (user_id)
),
ps_j AS (
  SELECT count(*) AS n FROM
    (SELECT DISTINCT pseudo FROM ev WHERE event_type = 'purchase') p
    JOIN (SELECT DISTINCT pseudo FROM ev WHERE event_type = 'click') c
      USING (pseudo)
)
SELECT event_type,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_pseudo AS BIGINT) AS n_pseudo,
       (n_users = n_pseudo) AS no_collisions,
       (SELECT n FROM raw_j) = (SELECT n FROM ps_j) AS join_preserved
FROM per ORDER BY event_type
""")
def d72_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.text import pseudonymize

    ev = (_t(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull())
          .select("event_type", "user_id",
                  pseudonymize("user_id").alias("pseudo")))
    per = (ev.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.count_distinct("user_id").alias("n_users"),
                F.count_distinct("pseudo").alias("n_pseudo")))
    pu = (ev.filter(F.col("event_type") == "purchase")
          .select("user_id", "pseudo").distinct())
    cl = (ev.filter(F.col("event_type") == "click")
          .select("user_id", "pseudo").distinct())
    raw_n = (pu.select("user_id").join(cl.select("user_id"), "user_id")
             .agg(F.count(F.lit(1)).alias("_raw_n")))
    ps_n = (pu.select("pseudo").join(cl.select("pseudo"), "pseudo")
            .agg(F.count(F.lit(1)).alias("_ps_n")))
    return (per.crossJoin(F.broadcast(raw_n))
            .crossJoin(F.broadcast(ps_n))
            .select("event_type",
                    F.col("n_events").cast("long").alias("n_events"),
                    F.col("n_users").cast("long").alias("n_users"),
                    F.col("n_pseudo").cast("long").alias("n_pseudo"),
                    (F.col("n_users") == F.col("n_pseudo"))
                    .alias("no_collisions"),
                    (F.col("_raw_n") == F.col("_ps_n"))
                    .alias("join_preserved"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Join-key skew report (the measure-before-you-salt diagnostic that
# motivates q42/q48's salted shapes): per-key row counts for
# orders.o_custkey reduced to concentration numbers — top-1 / top-10
# key share and an exact integer Gini coefficient
# (2*sum(i*x_sorted) - (n+1)*sum(x)) * 1e6 div (n*sum(x)) with the
# (count, key) total order making ranks engine-identical. The rank
# window runs over DISTINCT KEYS (|keys| rows, not |rows|) — the
# zipf_fit bounded-window convention, documented; everything else is
# one aggregate.
# ---------------------------------------------------------------------------
@q("q108_key_skew_report", """
WITH k AS (
  SELECT o_custkey AS key, count(*) AS c
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT c, row_number() OVER (ORDER BY c ASC, key ASC) AS i,
         row_number() OVER (ORDER BY c DESC, key ASC) AS rd
  FROM k
),
agg AS (
  SELECT count(*) AS n_keys, sum(c) AS n_rows,
         sum(i * c) AS s_ic,
         max(CASE WHEN rd = 1 THEN c END) AS top1,
         sum(CASE WHEN rd <= 10 THEN c ELSE 0 END) AS top10
  FROM r
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(top1 * 1000000 // n_rows AS BIGINT) AS top1_ppm,
       CAST(top10 * 1000000 // n_rows AS BIGINT) AS top10_ppm,
       CAST((2 * s_ic - (n_keys + 1) * n_rows) * 1000000
            // (n_keys * n_rows) AS BIGINT) AS gini_ppm
FROM agg
""")
def q108_key_skew_report(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    k = (_t(spark, sf_dir, "orders")
         .groupBy(F.col("o_custkey").alias("key"))
         .agg(F.count(F.lit(1)).alias("c")))
    r = (k.withColumn("i", F.row_number().over(
            W.orderBy(F.col("c").asc(), F.col("key").asc())))
         .withColumn("rd", F.row_number().over(
            W.orderBy(F.col("c").desc(), F.col("key").asc()))))
    return (r.agg(F.count(F.lit(1)).alias("n_keys"),
                  F.sum("c").alias("n_rows"),
                  F.sum(F.expr("i * c")).alias("s_ic"),
                  F.max(F.when(F.col("rd") == 1, F.col("c")))
                  .alias("top1"),
                  F.sum(F.when(F.col("rd") <= 10, F.col("c"))
                        .otherwise(F.lit(0))).alias("top10"))
            .select(F.col("n_rows").cast("long").alias("n_rows"),
                    F.col("n_keys").cast("long").alias("n_keys"),
                    F.expr("top1 * 1000000 div n_rows").cast("long")
                    .alias("top1_ppm"),
                    F.expr("top10 * 1000000 div n_rows").cast("long")
                    .alias("top10_ppm"),
                    F.expr("(2 * s_ic - (n_keys + 1) * n_rows) "
                           "* 1000000 div (n_keys * n_rows)")
                    .cast("long").alias("gini_ppm")))


# ---------------------------------------------------------------------------
# AllPairs prefix-filtered set-similarity join (dedup.prefix_filter_
# pairs; Bayardo/Ma/Srikant WWW 2007): EXACT Jaccard >= 1/2 over word
# 5-gram shingle sets with no all-pairs pass — rarest-first global
# shingle order, per-doc prefix of length n - ceil(n/2) + 1, prefix-
# only candidate join, integer length prune + intersection verify.
# Lossless at the threshold (hand test proves it against brute force;
# the sf0.001 corpus output is row-identical to the all-pairs SQL),
# which MinHash (d05) and df-capped containment (d59) cannot claim.
# Oracle replays the identical prefix pipeline; the (df ASC, shingle
# ASC) total order makes the per-doc ranks engine-identical.
# ---------------------------------------------------------------------------
@q("d73_prefix_filter_join", """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS g
  FROM t, unnest(range(1, len(w) - 3)) r(i)
),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
dfq AS (SELECT g, count(*) AS df FROM g GROUP BY g),
rk AS (
  SELECT g.doc_id, g.g, sz.n,
         row_number() OVER (PARTITION BY g.doc_id
                            ORDER BY dfq.df ASC, g.g ASC) AS r
  FROM g JOIN dfq USING (g) JOIN sz USING (doc_id)
),
pf AS (SELECT doc_id, g FROM rk WHERE r <= n - (n + 1) // 2 + 1),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM pf a JOIN pf b ON a.g = b.g AND a.doc_id < b.doc_id
),
c2 AS (
  SELECT a, b, sa.n AS n_a, sb.n AS n_b
  FROM cand JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
  WHERE 2 * least(sa.n, sb.n) >= greatest(sa.n, sb.n)
),
iv AS (
  SELECT c.a, c.b, min(c.n_a) AS n_a, min(c.n_b) AS n_b,
         count(*) AS inter
  FROM c2 c
  JOIN g ga ON ga.doc_id = c.a
  JOIN g gb ON gb.doc_id = c.b AND gb.g = ga.g
  GROUP BY c.a, c.b
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(inter AS BIGINT) AS inter,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(inter * 1000000 // (n_a + n_b - inter) AS BIGINT)
         AS jaccard_ppm
FROM iv WHERE 2 * inter >= n_a + n_b - inter
ORDER BY jaccard_ppm DESC, a ASC, b ASC LIMIT 20
""")
def d73_prefix_filter_join(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.dedup import prefix_filter_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = prefix_filter_pairs(docs, n=5, t_num=1, t_den=2)
    return (pairs.select(
                F.col("a").cast("long").alias("a"),
                F.col("b").cast("long").alias("b"),
                F.col("inter").cast("long").alias("inter"),
                F.col("n_a").cast("long").alias("n_a"),
                F.col("n_b").cast("long").alias("n_b"),
                F.col("jaccard_ppm").cast("long").alias("jaccard_ppm"))
            .orderBy(F.col("jaccard_ppm").desc(), F.col("a").asc(),
                     F.col("b").asc())
            .limit(20))


# ---------------------------------------------------------------------------
# HITS hubs & authorities (graph.hits_scores; Kleinberg 1999) over
# the queen grid made DIRECTED by the (a + 2b) % 3 <> 0 arc predicate
# (direction-specific, so in- and out-neighborhoods genuinely differ
# and hub != authority). 3 rounds of exact integer max-normalized
# score flow — floor rescale to [0, 1e6] replaces L2 normalization,
# making every round a pure BIGINT function both engines replay
# identically; the oracle unrolls all 3 rounds (the g22 discipline).
# The 1-row max aggregates broadcast back as the documented
# single-row-BNLJ pattern.
# ---------------------------------------------------------------------------
# AS MATERIALIZED is load-bearing: each round CTE is referenced twice
# (FROM + the max() scalar subquery), and this DuckDB build INLINES
# multi-referenced CTEs, turning 3 rounds into 2^6 re-evaluations of
# the grid join (>120 s at sf0.001; 0.04 s materialized).
_G29_ROUND = """
a{i} AS MATERIALIZED (
  SELECT n.k, coalesce(s.v, 0) AS raw FROM nodes n LEFT JOIN (
    SELECT e.b AS k, sum(h.v) AS v FROM e JOIN h{j} h ON h.k = e.a
    GROUP BY e.b
  ) s ON s.k = n.k
),
an{i} AS MATERIALIZED (
  SELECT k, raw * 1000000 // (SELECT max(raw) FROM a{i}) AS v
  FROM a{i}),
b{i} AS MATERIALIZED (
  SELECT n.k, coalesce(s.v, 0) AS raw FROM nodes n LEFT JOIN (
    SELECT e.a AS k, sum(x.v) AS v FROM e JOIN an{i} x ON x.k = e.b
    GROUP BY e.a
  ) s ON s.k = n.k
),
h{i} AS MATERIALIZED (
  SELECT k, raw * 1000000 // (SELECT max(raw) FROM b{i}) AS v
  FROM b{i})"""


@q("g29_hits_scores", f"""
WITH p AS (
  SELECT CAST(ceiling(sqrt(count(*))) AS BIGINT) AS side FROM customer
),
g AS (
  SELECT c_custkey AS k, c_custkey % side AS gx, c_custkey // side AS gy
  FROM customer, p
),
e0 AS (
  SELECT a.k AS a, b.k AS b FROM g a JOIN g b
    ON a.k <> b.k AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
),
e AS MATERIALIZED (SELECT a, b FROM e0 WHERE (a + 2 * b) % 3 <> 0),
nodes AS MATERIALIZED (SELECT a AS k FROM e UNION SELECT b AS k FROM e),
h0 AS MATERIALIZED (SELECT k, CAST(1000000 AS BIGINT) AS v FROM nodes),
{_G29_ROUND.format(i=1, j=0)},
{_G29_ROUND.format(i=2, j=1)},
{_G29_ROUND.format(i=3, j=2)}
SELECT CAST(n.k AS BIGINT) AS node,
       CAST(a3.v AS BIGINT) AS auth_ppm,
       CAST(h3.v AS BIGINT) AS hub_ppm
FROM nodes n JOIN an3 a3 ON a3.k = n.k JOIN h3 ON h3.k = n.k
ORDER BY auth_ppm DESC, node ASC LIMIT 20
""")
def g29_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.borders_store import customer_borders
    from ecmm428_pycart_spark.datapipe.graph import hits_scores

    # borders from the write-once store (round 9, datapipe/borders_store)
    # — the registry's heaviest query starts from a focal-clustered
    # parquet scan instead of rebuilding the queen-borders geometry.
    borders = customer_borders(spark, sf_dir)
    e = (borders.select(F.col("focal").alias("src"),
                        F.col("neighbor").alias("dst"))
         .filter((F.col("src") + 2 * F.col("dst")) % 3 != 0))
    out = hits_scores(e, rounds=3)
    return (out.select(F.col("node").cast("long").alias("node"),
                       F.col("auth_ppm").cast("long").alias("auth_ppm"),
                       F.col("hub_ppm").cast("long").alias("hub_ppm"))
            .orderBy(F.col("auth_ppm").desc(), F.col("node").asc())
            .limit(20))


# ---------------------------------------------------------------------------
# Rolling z-score volume anomalies (funnel.rolling_zscore_outliers):
# hourly event volumes per type scored against the 24 preceding
# observed hours with the division-free integer test
# (x*n - s)^2 > 9*(n*q - s^2) — exact BIGINT end to end, no float
# convention, strict at the 3-sigma boundary (hand test pins the
# exact-boundary, past-boundary and zero-variance cases). Reduced to
# per-type counts + the max flagged excess; only full windows score.
# ---------------------------------------------------------------------------
@q("q109_rolling_anomalies", """
WITH hc AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         count(*) AS x
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
wst AS (
  SELECT event_type, hr, x,
         count(*) OVER w AS n, sum(x) OVER w AS s,
         sum(x * x) OVER w AS q
  FROM hc WINDOW w AS (PARTITION BY event_type ORDER BY hr
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
),
sc AS (
  SELECT event_type,
         (x * n - s) * (x * n - s) - 9 * (n * q - s * s) AS excess
  FROM wst WHERE n = 24
),
tot AS (SELECT event_type, count(*) AS n_hours FROM hc GROUP BY 1),
agg AS (
  SELECT event_type, count(*) AS n_scored,
         sum(CASE WHEN excess > 0 THEN 1 ELSE 0 END) AS n_outliers,
         max(CASE WHEN excess > 0 THEN excess END) AS max_excess
  FROM sc GROUP BY 1
)
SELECT t.event_type,
       CAST(t.n_hours AS BIGINT) AS n_hours,
       CAST(coalesce(a.n_scored, 0) AS BIGINT) AS n_scored,
       CAST(coalesce(a.n_outliers, 0) AS BIGINT) AS n_outliers,
       CAST(coalesce(a.max_excess, 0) AS BIGINT) AS max_excess
FROM tot t LEFT JOIN agg a USING (event_type)
ORDER BY event_type
""")
def q109_rolling_anomalies(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.funnel import (
        rolling_zscore_outliers)

    ev = _t(spark, sf_dir, "events")
    sc = rolling_zscore_outliers(ev, window=24, z=3)
    tot = (ev.filter(F.col("ts").isNotNull())
           .groupBy(F.col("event_type"),
                    F.floor(F.unix_timestamp(
                        F.col("ts").cast("timestamp")) / 3600)
                    .cast("long").alias("hr"))
           .agg(F.count(F.lit(1)).alias("x"))
           .groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n_hours")))
    agg = (sc.groupBy(F.col("key").alias("event_type"))
           .agg(F.count(F.lit(1)).alias("n_scored"),
                F.sum("is_outlier").alias("n_outliers"),
                F.max(F.when(F.col("excess") > 0, F.col("excess")))
                .alias("max_excess")))
    return (tot.join(agg, "event_type", "left")
            .select("event_type",
                    F.col("n_hours").cast("long").alias("n_hours"),
                    F.coalesce("n_scored", F.lit(0)).cast("long")
                    .alias("n_scored"),
                    F.coalesce("n_outliers", F.lit(0)).cast("long")
                    .alias("n_outliers"),
                    F.coalesce("max_excess", F.lit(0)).cast("long")
                    .alias("max_excess"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Exact stratified sample allocation (text.sample_allocation):
# Hamilton/Hare largest-remainder apportionment of a 997-doc budget
# across (lang, n_chars div 200) strata — floor quotas + one extra to
# each of the largest remainders, ties by stratum key, so
# sum(alloc) == 997 EXACTLY (rate-based d16/temperature mixing only
# hit budgets in expectation). Pure integer function of the counts;
# the windows run over |strata| rows only. The f CTE is MATERIALIZED
# (referenced twice; this DuckDB build inlines multi-referenced CTEs
# — the g29 lesson).
# ---------------------------------------------------------------------------
@q("d74_sample_allocation", """
WITH s AS MATERIALIZED (
  SELECT lang, n_chars // 200 AS len_bucket, count(*) AS c
  FROM documents GROUP BY 1, 2
),
t AS (SELECT sum(c) AS tot FROM s),
f AS MATERIALIZED (
  SELECT lang, len_bucket, c,
         997 * c // tot AS floor_alloc, 997 * c % tot AS rem
  FROM s, t
),
l AS (SELECT 997 - sum(floor_alloc) AS leftover FROM f),
r AS (
  SELECT f.*, l.leftover,
         row_number() OVER (ORDER BY rem DESC, lang ASC,
                            len_bucket ASC) AS rk
  FROM f, l
)
SELECT lang, CAST(len_bucket AS BIGINT) AS len_bucket,
       CAST(c AS BIGINT) AS c,
       CAST(floor_alloc AS BIGINT) AS floor_alloc,
       CAST(rem AS BIGINT) AS rem,
       CAST(floor_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM r ORDER BY lang, len_bucket
""")
def d74_sample_allocation(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.text import sample_allocation

    s = (_t(spark, sf_dir, "documents")
         .groupBy("lang", F.expr("n_chars div 200").alias("len_bucket"))
         .agg(F.count(F.lit(1)).alias("c")))
    out = sample_allocation(s, 997, ["lang", "len_bucket"])
    return (out.select("lang",
                       F.col("len_bucket").cast("long")
                       .alias("len_bucket"),
                       F.col("c").cast("long").alias("c"),
                       F.col("floor_alloc").cast("long")
                       .alias("floor_alloc"),
                       F.col("rem").cast("long").alias("rem"),
                       F.col("alloc").cast("long").alias("alloc"))
            .orderBy("lang", "len_bucket"))


# ---------------------------------------------------------------------------
# REAL TGA type-10 RLE decode (multimodal.decode_tga_pixels): the
# m28 per-source rollup over run-length TARGA payloads — channel
# sums re-derived in SQL from the generator algebra, the top-left
# green orientation sentinel (37 on both bottom-up and top-down
# encodes), and the CLOSED-FORM packet counts (5 RLE + 1 RAW per
# row: runs of 3 across x < 15, two unique literals after) that only
# a decoder actually walking the packet stream reproduces.
# ---------------------------------------------------------------------------
@q("m38_tga_pixel_stats", """
WITH p AS (
  SELECT doc_id, source, doc_id % 7 + 1 AS a, doc_id % 5 + 1 AS b
  FROM documents
),
px AS (
  SELECT p.doc_id, p.source,
         sum((a * u.u + b * y.y) % 256) AS sr,
         sum((a * u.u + b * y.y + 37) % 256) AS sg,
         sum((a * u.u + b * y.y + 74) % 256) AS sb
  FROM p,
       (SELECT x, CASE WHEN x < 15 THEN x // 3 ELSE 100 + x END AS u
        FROM unnest(range(0, 17)) t(x)) u,
       unnest(range(0, 11)) y(y)
  GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(sr) AS BIGINT) AS total_r,
       CAST(sum(sg) AS BIGINT) AS total_g,
       CAST(sum(sb) AS BIGINT) AS total_b,
       CAST(count(*) * 187 AS BIGINT) AS n_pix,
       CAST(count(*) AS BIGINT) AS n_tl_correct,
       CAST(count(*) * 55 AS BIGINT) AS total_rle,
       CAST(count(*) * 11 AS BIGINT) AS total_raw
FROM px GROUP BY source
""")
def m38_tga_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe import multimodal

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    payload = docs.withColumn(
        "payload", multimodal.synth_tga_rle_payload(F.col("doc_id")))
    st = payload.withColumn(
        "s", multimodal.tga_pixel_stats(F.col("payload")))
    return (st.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("s.sum_r").cast("long").alias("total_r"),
                 F.sum("s.sum_g").cast("long").alias("total_g"),
                 F.sum("s.sum_b").cast("long").alias("total_b"),
                 F.sum("s.n_pix").cast("long").alias("n_pix"),
                 F.sum((F.col("s.tl_g") == 37).cast("long"))
                 .alias("n_tl_correct"),
                 F.sum("s.n_rle").cast("long").alias("total_rle"),
                 F.sum("s.n_raw").cast("long").alias("total_raw")))


# ---------------------------------------------------------------------------
# STREAMING rolling z-score anomalies (streaming.stream_rolling_
# anomaly): q109's monitor EXECUTED through Structured Streaming —
# applyInPandasWithState keyed by event_type, state = the hour->count
# map (bounded by the horizon's distinct hours), each emission
# rescoring its complete map with the division-free integer test.
# Count accumulation is associative, so the final emission (per-key
# argmax of the strictly-increasing n_events) is micro-batch-slicing
# invariant and replays exactly in the batch SQL oracle; the hand
# test additionally proves 2-slice == 3-slice == batch.
# ---------------------------------------------------------------------------
@q("st21_stream_rolling_anomaly", """
WITH hc AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         count(*) AS x
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
wst AS (
  SELECT event_type, hr, x,
         count(*) OVER w AS n, sum(x) OVER w AS s,
         sum(x * x) OVER w AS q
  FROM hc WINDOW w AS (PARTITION BY event_type ORDER BY hr
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
),
sc AS (
  SELECT event_type,
         (x * n - s) * (x * n - s) - 9 * (n * q - s * s) AS excess
  FROM wst WHERE n = 24
),
tot AS (SELECT event_type, count(*) AS n_hours, sum(x) AS n_events
        FROM hc GROUP BY 1),
agg AS (
  SELECT event_type, count(*) AS n_scored,
         sum(CASE WHEN excess > 0 THEN 1 ELSE 0 END) AS n_outliers,
         max(CASE WHEN excess > 0 THEN excess END) AS max_excess
  FROM sc GROUP BY 1
)
SELECT t.event_type,
       CAST(t.n_events AS BIGINT) AS n_events,
       CAST(t.n_hours AS BIGINT) AS n_hours,
       CAST(coalesce(a.n_scored, 0) AS BIGINT) AS n_scored,
       CAST(coalesce(a.n_outliers, 0) AS BIGINT) AS n_outliers,
       CAST(coalesce(a.max_excess, 0) AS BIGINT) AS max_excess
FROM tot t LEFT JOIN agg a USING (event_type)
ORDER BY event_type
""")
def st21_stream_rolling_anomaly(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    import uuid

    from pyspark.sql import Window as W

    from ecmm428_pycart_spark.benchmarks.relational import (
        _await_stream, _scratch)
    from ecmm428_pycart_spark.streaming.events import (
        read_events_stream, stream_rolling_anomaly,
        write_time_ordered_stream_dir)

    ev = (_t(spark, sf_dir, "events")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    slices = [ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i)
              for i in range(3)]
    d = _scratch("st21_events_")
    write_time_ordered_stream_dir(slices, d)
    name = f"st21_{uuid.uuid4().hex[:8]}"
    _await_stream(
        spark,
        stream_rolling_anomaly(
            read_events_stream(spark, d, max_files_per_trigger=1),
            window=24, z=3)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True))
    fin = (spark.table(name)
           .withColumn("_rn", F.row_number().over(
               W.partitionBy("event_type")
               .orderBy(F.col("n_events").desc())))
           .filter(F.col("_rn") == 1))
    return (fin.select("event_type",
                       F.col("n_events").cast("long").alias("n_events"),
                       F.col("n_hours").cast("long").alias("n_hours"),
                       F.col("n_scored").cast("long").alias("n_scored"),
                       F.col("n_outliers").cast("long")
                       .alias("n_outliers"),
                       F.col("max_excess").cast("long")
                       .alias("max_excess"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# CUBE + grouping_id (the grouping-sets sibling of q18's ROLLUP):
# order revenue by region x order-priority with ALL four grouping
# combinations in one pass, the grouping_id bitmask distinguishing
# data NULLs from subtotal NULLs (the reason warehouses emit it).
# Spark's cube()/grouping_id() against DuckDB's GROUP BY CUBE with
# grouping(a)*2 + grouping(b); revenue in exact BIGINT cents.
# ---------------------------------------------------------------------------
@q("q110_cube_revenue", """
SELECT r_name, o_orderpriority,
       CAST(grouping(r_name) * 2 + grouping(o_orderpriority)
            AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, o_orderpriority)
""")
def q110_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    dim = (c.join(F.broadcast(n),
                  F.col("c_nationkey") == F.col("n_nationkey"))
           .join(F.broadcast(r),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .select("c_custkey", "r_name"))
    return (o.select("o_custkey", "o_orderpriority",
                     F.round(F.col("o_totalprice") * 100).cast("long")
                     .alias("cents"))
            .join(dim, F.col("o_custkey") == F.col("c_custkey"))
            .cube("r_name", "o_orderpriority")
            .agg(F.grouping_id().cast("long").alias("gid"),
                 F.count(F.lit(1)).alias("n_orders"),
                 F.sum("cents").cast("long").alias("rev_cents"))
            .select("r_name", "o_orderpriority", "gid",
                    F.col("n_orders").cast("long").alias("n_orders"),
                    "rev_cents"))


# ---------------------------------------------------------------------------
# Community quality: Newman modularity of the g19 LPA labeling
# (graph.modularity_stats) in exact integers — per-community
# contribution in_c * 2m - D_c^2 (Q = sum/(2m)^2), NO division so
# negative terms need no floor convention. The oracle reuses g19's
# unrolled LPA round template, materializes the final labeling once
# (lf — the g29 inlining lesson), and restates the three aggregates;
# the 1-row 2m total is the documented single-row-BNLJ broadcast.
# ---------------------------------------------------------------------------
def _g31_sql():
    from ecmm428_pycart_spark.benchmarks.queued6 import _G19_ROUND
    rounds = ",".join(_G19_ROUND.format(i=i, j=i - 1)
                      for i in (1, 2, 3))
    return f"""
WITH p AS (
  SELECT CAST(ceiling(sqrt(count(*))) AS BIGINT) AS side FROM customer
),
g AS (
  SELECT c_custkey AS k, c_custkey % side AS gx, c_custkey // side AS gy
  FROM customer, p
),
e AS (
  SELECT a.k AS a, b.k AS b
  FROM g a JOIN g b
    ON (a.k < b.k AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1)
),
und AS MATERIALIZED (
  SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
l0 AS (SELECT k, k % 16 AS lab FROM g),
{rounds},
lf AS MATERIALIZED (SELECT k, lab FROM l3),
deg AS (SELECT a AS k, count(*) AS deg FROM und GROUP BY a),
tm AS (SELECT count(*) AS two_m FROM und),
ds AS (
  SELECT l.lab, count(*) AS n_nodes,
         sum(coalesce(d.deg, 0)) AS deg_sum
  FROM lf l LEFT JOIN deg d USING (k) GROUP BY 1
),
ic AS (
  SELECT la.lab, count(*) AS in_rows
  FROM und u JOIN lf la ON la.k = u.a JOIN lf lb ON lb.k = u.b
  WHERE la.lab = lb.lab GROUP BY 1
)
SELECT CAST(d.lab AS BIGINT) AS label,
       CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(coalesce(in_rows, 0) AS BIGINT) AS in_rows,
       CAST(deg_sum AS BIGINT) AS deg_sum,
       CAST(two_m AS BIGINT) AS two_m,
       CAST(coalesce(in_rows, 0) * two_m - deg_sum * deg_sum
            AS BIGINT) AS contrib
FROM ds d LEFT JOIN ic USING (lab), tm
ORDER BY n_nodes DESC, label ASC LIMIT 20
"""


@q("g31_lpa_modularity", _g31_sql())
def g31_lpa_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.borders_store import (
        customer_borders, customer_nodes)
    from ecmm428_pycart_spark.datapipe.graph import (label_propagation,
                                                     modularity_stats)

    # borders from the write-once store (round 9, datapipe/borders_store);
    # seeds straight from the customer keys — no geometry build here.
    borders = customer_borders(spark, sf_dir)
    e = borders.select(F.col("focal").alias("src"),
                       F.col("neighbor").alias("dst"))
    seeds = customer_nodes(spark, sf_dir).select(
        F.col("region_idx").alias("node"),
        (F.col("region_idx") % 16).alias("label"))
    labels = label_propagation(e, seeds, rounds=3)
    out = modularity_stats(e, labels)
    return (out.select(F.col("label").cast("long").alias("label"),
                       F.col("n_nodes").cast("long").alias("n_nodes"),
                       F.col("in_rows").cast("long").alias("in_rows"),
                       F.col("deg_sum").cast("long").alias("deg_sum"),
                       F.col("two_m").cast("long").alias("two_m"),
                       F.col("contrib").cast("long").alias("contrib"))
            .orderBy(F.col("n_nodes").desc(), F.col("label").asc())
            .limit(20))


# ---------------------------------------------------------------------------
# REAL protobuf wire-format walk (multimodal.decode_pb_fields): the
# schema-free varint / zigzag / length-delimited byte grammar of
# protobuf log shippers, decoded by a generic wire walk — multi-byte
# varints, zigzag sints, packed repeated fields, one nested message,
# fixed64/fixed32, and an unknown field skipped by wire type (the
# forward-compatibility rule). Every decoded value has a closed-form
# oracle from the doc columns, so a decode that misreads any byte
# grammar rule diverges; per-source integer rollup.
# ---------------------------------------------------------------------------
@q("m39_protobuf_wire_stats", """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) * 8 AS BIGINT) AS total_fields,
       CAST(count(*) AS BIGINT) AS total_unknown,
       CAST(sum(doc_id) AS BIGINT) AS sum_v1,
       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN doc_id % 1000
                     ELSE -(doc_id % 1000) END) AS BIGINT) AS sum_v2,
       CAST(sum(length(lang)) AS BIGINT) AS sum_len3,
       CAST(sum(doc_id % 7 + doc_id % 11 + doc_id % 13) AS BIGINT)
         AS sum_packed,
       CAST(sum(n_chars) AS BIGINT) AS sum_nested,
       CAST(sum((doc_id * 2654435761) % 4294967296) AS BIGINT)
         AS sum_f64_mod,
       CAST(sum(doc_id % 65536) AS BIGINT) AS sum_f32
FROM documents GROUP BY source
""")
def m39_protobuf_wire_stats(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe import multimodal

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars")
    payload = docs.withColumn(
        "payload", multimodal.synth_pb_payload(
            F.col("doc_id"), F.col("lang"), F.col("source"),
            F.col("n_chars")))
    st = payload.withColumn(
        "s", multimodal.pb_field_stats(F.col("payload")))
    return (st.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("s.n_fields").cast("long").alias("total_fields"),
                 F.sum("s.n_unknown").cast("long")
                 .alias("total_unknown"),
                 F.sum("s.v1").cast("long").alias("sum_v1"),
                 F.sum("s.v2").cast("long").alias("sum_v2"),
                 F.sum("s.len3").cast("long").alias("sum_len3"),
                 F.sum("s.packed_sum").cast("long").alias("sum_packed"),
                 F.sum("s.nested_n").cast("long").alias("sum_nested"),
                 F.sum("s.f64_mod").cast("long").alias("sum_f64_mod"),
                 F.sum("s.f32").cast("long").alias("sum_f32")))


# ---------------------------------------------------------------------------
# Hour-of-day seasonal profile (the baseline q109/st21's rolling
# monitor needs next: "is 3x traffic at 14:00 a spike, or just
# afternoon?"): per (event_type, UTC hour-of-day), observed-hour
# count, total volume, per-hour mean in ppm, and the seasonal INDEX
# — this hod's mean over the type's overall mean, in ppm — all
# integer floor arithmetic (hod = epoch-hour % 24, calendar-free).
# ---------------------------------------------------------------------------
@q("q111_seasonal_profile", """
WITH hc AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         count(*) AS x
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
hod AS (
  SELECT event_type, hr % 24 AS hod, count(*) AS n_hours,
         sum(x) AS total
  FROM hc GROUP BY 1, 2
),
base AS (
  SELECT event_type, sum(total) AS grand, sum(n_hours) AS all_hours
  FROM hod GROUP BY 1
)
SELECT h.event_type, CAST(h.hod AS BIGINT) AS hod,
       CAST(h.n_hours AS BIGINT) AS n_hours,
       CAST(h.total AS BIGINT) AS total,
       CAST(h.total * 1000000 // h.n_hours AS BIGINT) AS mean_ppm,
       CAST(h.total * b.all_hours * 1000000
            // (h.n_hours * b.grand) AS BIGINT) AS season_ppm
FROM hod h JOIN base b USING (event_type)
ORDER BY event_type, hod
""")
def q111_seasonal_profile(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    hc = (_t(spark, sf_dir, "events")
          .filter(F.col("ts").isNotNull())
          .groupBy("event_type",
                   F.floor(F.unix_timestamp(
                       F.col("ts").cast("timestamp")) / 3600)
                   .cast("long").alias("hr"))
          .agg(F.count(F.lit(1)).alias("x")))
    hod = (hc.groupBy("event_type",
                      (F.col("hr") % 24).alias("hod"))
           .agg(F.count(F.lit(1)).alias("n_hours"),
                F.sum("x").alias("total")))
    base = (hod.groupBy("event_type")
            .agg(F.sum("total").alias("grand"),
                 F.sum("n_hours").alias("all_hours")))
    return (hod.join(F.broadcast(base), "event_type")
            .select("event_type",
                    F.col("hod").cast("long").alias("hod"),
                    F.col("n_hours").cast("long").alias("n_hours"),
                    F.col("total").cast("long").alias("total"),
                    F.expr("total * 1000000 div n_hours").cast("long")
                    .alias("mean_ppm"),
                    F.expr("total * all_hours * 1000000 "
                           "div (n_hours * grand)").cast("long")
                    .alias("season_ppm"))
            .orderBy("event_type", "hod"))


# ---------------------------------------------------------------------------
# Winsorized robust statistics (the outlier-resistant mean the q40
# IQR report motivates): per event_type, clamp value-cents to the
# exact order statistics at ceil(0.05n) / ceil(0.95n) (1-based rank
# — the quantile_disc discipline, no interpolation convention
# needed) and report the winsorized sum + clip count. The rank
# window is the st20 per-type sort shape.
# ---------------------------------------------------------------------------
@q("d75_winsorized_stats", """
WITH v AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
b AS (
  SELECT event_type, max(n) AS n,
         max(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END)
           AS c_lo,
         max(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END)
           AS c_hi
  FROM r GROUP BY 1
)
SELECT v.event_type,
       CAST(max(b.n) AS BIGINT) AS n_rows,
       CAST(max(b.c_lo) AS BIGINT) AS lo_cents,
       CAST(max(b.c_hi) AS BIGINT) AS hi_cents,
       CAST(sum(least(greatest(v.cents, b.c_lo), b.c_hi)) AS BIGINT)
         AS winsor_sum_cents,
       CAST(sum(CASE WHEN v.cents < b.c_lo OR v.cents > b.c_hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM v JOIN b USING (event_type)
GROUP BY 1 ORDER BY event_type
""")
def d75_winsorized_stats(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    v = (_t(spark, sf_dir, "events")
         .filter(F.col("value").isNotNull())
         .select("event_type",
                 F.floor(F.col("value") * 100).cast("long")
                 .alias("cents")))
    r = (v.withColumn("rn", F.row_number().over(
             W.partitionBy("event_type").orderBy("cents")))
         .withColumn("n", F.count(F.lit(1)).over(
             W.partitionBy("event_type"))))
    b = (r.groupBy("event_type")
         .agg(F.max("n").alias("n"),
              F.max(F.when(F.col("rn")
                           == F.expr("(n * 5 + 99) div 100"),
                           F.col("cents"))).alias("c_lo"),
              F.max(F.when(F.col("rn")
                           == F.expr("(n * 95 + 99) div 100"),
                           F.col("cents"))).alias("c_hi")))
    return (v.join(F.broadcast(b), "event_type")
            .groupBy("event_type")
            .agg(F.max("n").cast("long").alias("n_rows"),
                 F.max("c_lo").cast("long").alias("lo_cents"),
                 F.max("c_hi").cast("long").alias("hi_cents"),
                 F.sum(F.least(F.greatest(F.col("cents"),
                                          F.col("c_lo")),
                               F.col("c_hi"))).cast("long")
                 .alias("winsor_sum_cents"),
                 F.sum(((F.col("cents") < F.col("c_lo"))
                        | (F.col("cents") > F.col("c_hi")))
                       .cast("long")).alias("n_clipped"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# REAL LZ4 block roundtrip over the corpus text (multimodal.lz4_
# compress_block/_decompress_block): every document's utf-8 bytes
# compressed with the greedy hash-chain encoder and decoded back by
# the spec-faithful token walk; the gate pins the DECODED byte count
# (strlen) and the 60-bit md5 fingerprint of the decoded bytes
# against the closed-form oracle on the original text — an exact
# roundtrip proof through the match/literal grammar, per source.
# ---------------------------------------------------------------------------
@q("m40_lz4_roundtrip", """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT
                % 1000000000) AS BIGINT) AS fp_sum
FROM documents GROUP BY source
""")
def m40_lz4_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe import multimodal

    docs = _t(spark, sf_dir, "documents").select("source", "text")
    payload = docs.withColumn(
        "payload", multimodal.synth_lz4_payload(F.col("text")))
    st = payload.withColumn(
        "s", multimodal.lz4_roundtrip_stats(F.col("payload")))
    return (st.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("s.n_bytes").cast("long").alias("total_bytes"),
                 F.sum(F.col("s.fp") % 1000000000).cast("long")
                 .alias("fp_sum")))


# ---------------------------------------------------------------------------
# Sweep-line session concurrency (the capacity-planning number on
# top of q100's sessionization): sessions become +1/-1 endpoint
# deltas on closed [s, e] second intervals, the running sum over
# distinct endpoint times is the concurrency profile, and the gate
# pins its max, the EARLIEST time it is reached, and total active
# seconds. The sweep window runs over distinct endpoint seconds
# (two per session), never the event stream; the 1-row aggregates
# broadcast back as the documented single-row-BNLJ pattern. sb/run
# are MATERIALIZED (multi-referenced — the g29 inlining lesson).
# ---------------------------------------------------------------------------
@q("q112_session_concurrency", """
WITH ev AS (SELECT user_id, event_id, ts FROM events
            WHERE ts IS NOT NULL),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS ns
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(ns) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS session_id
  FROM flagged
),
sb AS MATERIALIZED (
  SELECT user_id, session_id,
         date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                   min(ts)) AS s,
         date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                   max(ts)) AS e
  FROM sess GROUP BY 1, 2
),
deltas AS (
  SELECT s AS t, 1 AS d FROM sb
  UNION ALL SELECT e + 1 AS t, -1 AS d FROM sb
),
prof AS (SELECT t, sum(d) AS nd FROM deltas GROUP BY t),
run AS MATERIALIZED (
  SELECT t, sum(nd) OVER (ORDER BY t) AS conc FROM prof
),
mx AS (SELECT max(conc) AS max_conc FROM run)
SELECT CAST((SELECT count(*) FROM sb) AS BIGINT) AS n_sessions,
       CAST(mx.max_conc AS BIGINT) AS max_conc,
       CAST((SELECT min(t) FROM run WHERE conc = mx.max_conc)
            AS BIGINT) AS t_at_max,
       CAST((SELECT sum(e - s + 1) FROM sb) AS BIGINT)
         AS total_active_secs
FROM mx
""")
def q112_session_concurrency(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ecmm428_pycart_spark.datapipe.funnel import sessionize

    ses = sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)
    sb = (ses.groupBy("user_id", "session_id")
          .agg(F.min(F.col("ts").cast("timestamp")).cast("long")
               .alias("s"),
               F.max(F.col("ts").cast("timestamp")).cast("long")
               .alias("e"))
          .localCheckpoint())
    deltas = (sb.select(F.col("s").alias("t"), F.lit(1).alias("d"))
              .unionByName(sb.select((F.col("e") + 1).alias("t"),
                                     F.lit(-1).alias("d"))))
    # two-phase distributed prefix sum (the documented 100 TB form,
    # implemented round 8 and extracted to
    # funnel.distributed_prefix_sum; SCALING.md's "partition the
    # sweep by day and carry per-day opening balances"): no single
    # reducer ever sees the full endpoint stream, and exact integer
    # sums keep the result identical to the global window the DuckDB
    # oracle states (property-pinned on arbitrary inputs).
    from ecmm428_pycart_spark.datapipe.funnel import (
        distributed_prefix_sum)
    prof = deltas.groupBy("t").agg(F.sum("d").alias("nd"))
    run = distributed_prefix_sum(prof, "t", "nd", out_col="conc",
                                 bucket=86400)
    a1 = sb.agg(F.count(F.lit(1)).alias("n_sessions"),
                F.sum(F.col("e") - F.col("s") + 1)
                .alias("total_active_secs"))
    mx = run.agg(F.max("conc").alias("max_conc"))
    at = (run.crossJoin(F.broadcast(mx))
          .filter(F.col("conc") == F.col("max_conc"))
          .agg(F.min("t").alias("t_at_max"),
               F.max("conc").alias("max_conc")))
    return (a1.crossJoin(F.broadcast(at))
            .select(F.col("n_sessions").cast("long")
                    .alias("n_sessions"),
                    F.col("max_conc").cast("long").alias("max_conc"),
                    F.col("t_at_max").cast("long").alias("t_at_max"),
                    F.col("total_active_secs").cast("long")
                    .alias("total_active_secs")))


# ---------------------------------------------------------------------------
# Clamped running balance (funnel.clamped_balance): the wallet model
# — credits (signup/purchase) add value-cents, everything else
# spends, and the balance truncates at ZERO with each overdraw
# counted. The max(0, .) recurrence is not window algebra (every
# prefix depends on every prior clamp), so both engines FOLD the
# ordered ledger: Spark's aggregate() over the array_sort'ed
# (micros, event_id) structs, DuckDB's list_reduce over an ORDER
# BY'd list aggregate, both with the balance*65536 + clamps packed
# BIGINT accumulator — identical integer recurrences.
# ---------------------------------------------------------------------------
@q("q113_clamped_balance", """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CASE WHEN event_type IN ('signup', 'purchase')
              THEN CAST(round(value * 100) AS BIGINT)
              ELSE -CAST(round(value * 100) AS BIGINT) END AS d
  FROM events WHERE ts IS NOT NULL
),
arr AS (
  SELECT user_id, count(*) AS n_events, sum(d) AS net_cents,
         list_prepend(CAST(0 AS BIGINT),
                      list(d ORDER BY us, event_id)) AS ds
  FROM ev GROUP BY user_id
),
f AS (
  SELECT user_id, n_events, net_cents,
         list_reduce(ds, (acc, x) ->
           greatest(acc // 65536 + x, CAST(0 AS BIGINT)) * 65536
           + acc % 65536
           + (CASE WHEN acc // 65536 + x < 0 THEN 1 ELSE 0 END)) AS p
  FROM arr
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(net_cents AS BIGINT) AS net_cents,
       CAST(p // 65536 AS BIGINT) AS final_cents,
       CAST(p % 65536 AS BIGINT) AS n_clamps
FROM f ORDER BY user_id
""")
def q113_clamped_balance(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.funnel import clamped_balance

    out = clamped_balance(_t(spark, sf_dir, "events"))
    return (out.select(F.col("user_id").cast("long").alias("user_id"),
                       F.col("n_events").cast("long").alias("n_events"),
                       F.col("net_cents").cast("long")
                       .alias("net_cents"),
                       F.col("final_cents").cast("long")
                       .alias("final_cents"),
                       F.col("n_clamps").cast("long")
                       .alias("n_clamps"))
            .orderBy("user_id"))


# ---------------------------------------------------------------------------
# Corpus novelty curve (the redundancy-growth readout crawl curation
# watches: as a crawl grows, what fraction of each new doc's
# content is genuinely new?): per word-3-gram, the FIRST doc_id that
# contains it (one gram-keyed min aggregate); a doc's novelty = the
# ppm share of its distinct grams it introduced; rolled up into
# doc_id-div-100 "crawl batches" so the gate reads the decay curve.
# Pure gram-keyed shuffles (the d28/d59 cost class), no windows.
# ---------------------------------------------------------------------------
@q("d76_novelty_curve", """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gr
  FROM t, unnest(range(1, len(w) - 1)) r(i)
),
fst AS (SELECT gr, min(doc_id) AS first_doc FROM g GROUP BY gr),
per_doc AS (
  SELECT g.doc_id, count(*) AS n_grams,
         sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
           AS n_novel
  FROM g JOIN fst f USING (gr) GROUP BY g.doc_id
)
SELECT CAST(doc_id // 100 AS BIGINT) AS batch,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_grams) AS BIGINT) AS total_grams,
       CAST(sum(n_novel) AS BIGINT) AS total_novel,
       CAST(sum(n_novel) * 1000000 // sum(n_grams) AS BIGINT)
         AS novelty_ppm
FROM per_doc GROUP BY 1 ORDER BY batch
""")
def d76_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.dedup import shingle_set

    docs = _t(spark, sf_dir, "documents")
    g = docs.select("doc_id",
                    F.explode(shingle_set(F.col("text"), 3))
                    .alias("gr"))
    fst = g.groupBy("gr").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (g.join(fst, "gr")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.sum((F.col("first_doc") == F.col("doc_id"))
                          .cast("long")).alias("n_novel")))
    return (per_doc.groupBy(F.expr("doc_id div 100").cast("long")
                            .alias("batch"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_grams").cast("long").alias("total_grams"),
                 F.sum("n_novel").cast("long").alias("total_novel"),
                 F.expr("sum(n_novel) * 1000000 div sum(n_grams)")
                 .cast("long").alias("novelty_ppm"))
            .orderBy("batch"))


# ---------------------------------------------------------------------------
# Scalar distribution drift (s29's sibling for value columns — the
# PSI-style monitor a pipeline runs between snapshots): events split
# into two cohorts by epoch-DAY PARITY (deterministic, no median
# convention), values bucketed to 20-dollar cents bands, and a
# division-safe integer chi-square score per event_type:
# sum((a-b)^2 * 1e6 // (a+b)) over buckets — plus the single worst
# bucket's contribution. Two aggregates, no windows, no floats.
# ---------------------------------------------------------------------------
@q("q114_value_drift", """
WITH v AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) % 2 AS half,
         CAST(floor(value * 100) AS BIGINT) // 2000 AS bucket
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
b AS (
  SELECT event_type, bucket,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c
  FROM v GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(a) AS BIGINT) AS n_even_days,
       CAST(sum(c) AS BIGINT) AS n_odd_days,
       CAST(sum((a - c) * (a - c) * 1000000 // (a + c)) AS BIGINT)
         AS chi2_ppm,
       CAST(max((a - c) * (a - c) * 1000000 // (a + c)) AS BIGINT)
         AS worst_bucket_ppm
FROM b GROUP BY event_type ORDER BY event_type
""")
def q114_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (_t(spark, sf_dir, "events")
         .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
         .select("event_type",
                 (F.floor(F.unix_timestamp(
                     F.col("ts").cast("timestamp")) / 86400)
                  .cast("long") % 2).alias("half"),
                 F.expr("floor(value * 100) div 2000").cast("long")
                 .alias("bucket")))
    b = (v.groupBy("event_type", "bucket")
         .agg(F.sum((F.col("half") == 0).cast("long")).alias("a"),
              F.sum((F.col("half") == 1).cast("long")).alias("c")))
    return (b.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_buckets"),
                 F.sum("a").cast("long").alias("n_even_days"),
                 F.sum("c").cast("long").alias("n_odd_days"),
                 F.sum(F.expr("(a - c) * (a - c) * 1000000 "
                              "div (a + c)")).cast("long")
                 .alias("chi2_ppm"),
                 F.max(F.expr("(a - c) * (a - c) * 1000000 "
                              "div (a + c)")).cast("long")
                 .alias("worst_bucket_ppm"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# REAL Parquet RLE/bit-packing hybrid decode (multimodal.rle_bp_
# decode): the integer encoding under every parquet column, walked
# over synthetic 64-value 4-bit streams whose shape forces both
# group kinds — 4 runs of 10 (RLE) then 24 stride-3 literals (three
# bit-packed groups of 8). The gate pins value sums (closed-form
# from the generator algebra), the exact group counts only a real
# header walk reproduces, and a position sentinel (the last value).
# ---------------------------------------------------------------------------
@q("m41_rle_bp_stats", """
WITH p AS (SELECT doc_id, source, doc_id % 7 + 1 AS a FROM documents),
s AS (
  SELECT p.doc_id, p.source,
         (SELECT sum(10 * ((p.a * k.k) % 16))
          FROM unnest(range(0, 4)) k(k))
         + (SELECT sum((p.a + 3 * j.j) % 16)
            FROM unnest(range(40, 64)) j(j)) AS vsum,
         (p.a + 189) % 16 AS last_val
  FROM p
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) * 64 AS BIGINT) AS total_vals,
       CAST(sum(vsum) AS BIGINT) AS total_sum,
       CAST(count(*) * 4 AS BIGINT) AS total_rle,
       CAST(count(*) * 3 AS BIGINT) AS total_bp,
       CAST(sum(last_val) AS BIGINT) AS last_val_sum
FROM s GROUP BY source
""")
def m41_rle_bp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe import multimodal

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    payload = docs.withColumn(
        "payload", multimodal.synth_rle_bp_payload(F.col("doc_id")))
    st = payload.withColumn(
        "s", multimodal.rle_bp_stats(F.col("payload")))
    return (st.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("s.n_vals").cast("long").alias("total_vals"),
                 F.sum("s.vsum").cast("long").alias("total_sum"),
                 F.sum("s.n_rle").cast("long").alias("total_rle"),
                 F.sum("s.n_bp").cast("long").alias("total_bp"),
                 F.sum("s.last_val").cast("long")
                 .alias("last_val_sum")))


# ---------------------------------------------------------------------------
# Graph partition quality under node-hash placement (the diagnostic
# that decides whether a 100 TB graph needs smarter partitioning
# than hash: edge-cut share + balance): nodes placed by k % 8, per
# partition the node count, internal edge rows and cut edge rows
# (endpoint partitions differ), with the cut share in ppm. One
# closed-form "label" join onto the queen-grid edge list — the g31
# aggregate shape minus the LPA chain; everything integer.
# ---------------------------------------------------------------------------
@q("g32_partition_quality", """
WITH p AS (
  SELECT CAST(ceiling(sqrt(count(*))) AS BIGINT) AS side FROM customer
),
g AS (
  SELECT c_custkey AS k, c_custkey % side AS gx, c_custkey // side AS gy
  FROM customer, p
),
e AS (
  SELECT a.k AS a, b.k AS b
  FROM g a JOIN g b
    ON (a.k < b.k AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1)
),
und AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
ed AS (
  SELECT a % 8 AS part,
         CASE WHEN a % 8 = b % 8 THEN 1 ELSE 0 END AS internal
  FROM und
),
np AS (SELECT k % 8 AS part, count(*) AS n_nodes FROM g GROUP BY 1),
es AS (
  SELECT part, sum(internal) AS n_internal,
         sum(1 - internal) AS n_cut
  FROM ed GROUP BY part
)
SELECT CAST(np.part AS BIGINT) AS part,
       CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(coalesce(n_internal, 0) AS BIGINT) AS n_internal,
       CAST(coalesce(n_cut, 0) AS BIGINT) AS n_cut,
       CAST(coalesce(n_cut, 0) * 1000000
            // greatest(coalesce(n_internal, 0)
                        + coalesce(n_cut, 0), 1) AS BIGINT)
         AS cut_ppm
FROM np LEFT JOIN es USING (part)
ORDER BY part
""")
def g32_partition_quality(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.benchmarks.geo_queries import _customer_grid
    from ecmm428_pycart_spark.operators.borders import get_borders

    grid = _customer_grid(spark, sf_dir).drop("value")
    borders, _ = get_borders(grid, "region_idx", "geometry",
                             idx_field="region_idx")
    und = borders.select(F.col("focal").alias("a"),
                         F.col("neighbor").alias("b"))
    np_ = (grid.select((F.col("region_idx") % 8).alias("part"))
           .groupBy("part").agg(F.count(F.lit(1)).alias("n_nodes")))
    ed = und.select((F.col("a") % 8).alias("part"),
                    (F.col("a") % 8 == F.col("b") % 8).cast("long")
                    .alias("internal"))
    es = (ed.groupBy("part")
          .agg(F.sum("internal").alias("n_internal"),
               F.sum(1 - F.col("internal")).alias("n_cut")))
    return (np_.join(es, "part", "left")
            .select(F.col("part").cast("long").alias("part"),
                    F.col("n_nodes").cast("long").alias("n_nodes"),
                    F.coalesce("n_internal", F.lit(0)).cast("long")
                    .alias("n_internal"),
                    F.coalesce("n_cut", F.lit(0)).cast("long")
                    .alias("n_cut"),
                    F.expr("coalesce(n_cut, 0) * 1000000 div "
                           "greatest(coalesce(n_internal, 0) "
                           "+ coalesce(n_cut, 0), 1)").cast("long")
                    .alias("cut_ppm"))
            .orderBy("part"))


# ---------------------------------------------------------------------------
# Supplier shipping-coverage islands (gaps-and-islands interval
# coalescing — the warranty/uptime/promo-window rollup every
# warehouse engine ships): each lineitem opens a coverage interval
# of 1 + (quantity % 14) inclusive epoch-days from its ship date;
# per supplier the merged-island count, covered days and longest
# continuous stretch. funnel.interval_islands does the per-key
# ordered-window merge (running max-end -> break flags -> prefix
# sum). Ties order-invariant, everything integer.
#
# ORACLE NOTE (round 10): the original oracle replayed the identical
# window algebra in SQL, but DuckDB 1.0.0's PARALLEL window execution
# returns a nondeterministic WRONG answer for the running-max frame
# on this ~600k-row input (~50% of contended sf0.1 runs: suppkey 62
# covered_days 2089 vs ground truth 2085 — pure-Python replay and the
# Spark side agree on 2085; SET threads<=2 always agrees; threads>=4
# flakes; a lag(running-max) restatement flaked harder). The oracle
# below is window-FREE and provably equivalent:
#   * an interval's span is <= 13 days by construction
#     (l_quantity % 14), so "s_i > max(e_j) over all earlier
#     intervals" <=> no interval with s_j in [s_i-13, s_i-1] has
#     e_j >= s_i (same-s rows never break after their group's first
#     row because e_j >= s_j = s_i) — a bounded NOT EXISTS band join;
#   * islands are the runs between breaks in (s, e) order, so each
#     interval's island is the greatest break s <= its s — a plain
#     join + max, no frames.
# Hash join + hash aggregate only — DuckDB's battle-tested operators;
# 0 wrong answers in 40 contended sf0.1 trials (vs 21/40 for the
# window form).
# ---------------------------------------------------------------------------
@q("q115_interval_islands", """
WITH iv AS (
  SELECT l_suppkey AS k,
         CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) AS s,
         CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT)
           + CAST(l_quantity AS BIGINT) % 14 AS e
  FROM lineitem
),
ivd AS (
  SELECT k, s, e, count(*) AS cnt FROM iv GROUP BY 1, 2, 3
),
brk AS (
  SELECT DISTINCT k, s FROM ivd a
  WHERE NOT EXISTS (
    SELECT 1 FROM ivd b
    WHERE b.k = a.k AND b.s < a.s AND b.s >= a.s - 13 AND b.e >= a.s
  )
),
asg AS (
  SELECT ivd.k, ivd.s, ivd.e, ivd.cnt, max(brk.s) AS island_s
  FROM ivd JOIN brk ON brk.k = ivd.k AND brk.s <= ivd.s
  GROUP BY ivd.k, ivd.s, ivd.e, ivd.cnt
),
gi AS (
  SELECT k, island_s, min(s) AS i_s, max(e) AS i_e,
         sum(cnt) AS n_iv
  FROM asg GROUP BY k, island_s
)
SELECT CAST(k AS BIGINT) AS suppkey,
       CAST(sum(n_iv) AS BIGINT) AS n_intervals,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(i_e - i_s + 1) AS BIGINT) AS covered_days,
       CAST(max(i_e - i_s + 1) AS BIGINT) AS max_island_days
FROM gi GROUP BY k ORDER BY suppkey
""")
def q115_interval_islands(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.funnel import interval_islands

    day = F.floor(F.unix_timestamp(F.col("l_shipdate")) / 86400) \
        .cast("long")
    iv = (_t(spark, sf_dir, "lineitem")
          .select(F.col("l_suppkey").alias("k"), day.alias("s"),
                  (day + F.col("l_quantity").cast("long") % 14)
                  .alias("e")))
    out = interval_islands(iv, "k", "s", "e")
    return (out.select(F.col("k").cast("long").alias("suppkey"),
                       F.col("n_intervals").cast("long")
                       .alias("n_intervals"),
                       F.col("n_islands").cast("long")
                       .alias("n_islands"),
                       F.col("covered_units").cast("long")
                       .alias("covered_days"),
                       F.col("max_island_units").cast("long")
                       .alias("max_island_days"))
            .orderBy("suppkey"))


# ---------------------------------------------------------------------------
# REAL DEFLATE roundtrip over the corpus text (multimodal.inflate /
# zlib_decompress_manual): every document's utf-8 bytes compressed
# with stdlib zlib (the canonical producer) and decoded back by the
# hand-rolled RFC 1951 bit walk — stored + fixed-Huffman + dynamic-
# Huffman blocks, byte-serial LZ77 copies, Adler-32 trailer verified
# against the hand-rolled checksum. The gate pins the DECODED byte
# count and 60-bit md5 fingerprint against the closed-form oracle on
# the original text (the m40 discipline for a far richer grammar).
# ---------------------------------------------------------------------------
@q("m42_inflate_roundtrip", """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT
                % 1000000000) AS BIGINT) AS fp_sum
FROM documents GROUP BY source
""")
def m42_inflate_roundtrip(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe import multimodal

    docs = _t(spark, sf_dir, "documents").select("source", "text")
    payload = docs.withColumn(
        "payload", multimodal.synth_zlib_payload(F.col("text")))
    st = payload.withColumn(
        "s", multimodal.inflate_roundtrip_stats(F.col("payload")))
    return (st.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("s.n_bytes").cast("long").alias("total_bytes"),
                 F.sum(F.col("s.fp") % 1000000000).cast("long")
                 .alias("fp_sum")))


# ---------------------------------------------------------------------------
# Two-phase connected components (graph.cc_two_phase — the SoCC'14
# large-star/small-star algorithm whose O(log^2 n) rounds replace
# O(diameter) label propagation on deep graphs at 100 TB): customers
# in blocks of 8 consecutive keys, chain edges (k, k+1) kept with
# md5-probability 0.7 and skip edges (k, k+2) with 0.25 — a forest
# of sub-8-node components whose diameter is <= 7, so the oracle can
# replay plain min-label propagation with SEVEN unrolled MATERIALIZED
# rounds (the g19/g26 discipline) while the Spark side runs the
# star-contraction algorithm; identical labels prove both. Gate =
# the component-size histogram + min-label checksum.
# ---------------------------------------------------------------------------
_G33_RNG = ("(CAST(concat('0x', substr(md5('{p}' || CAST(a.k AS "
            "VARCHAR)), 1, 8)) AS UBIGINT) + 0.5) / 4294967296.0")
_G33_ROUND = """
r{i} AS MATERIALIZED (
  SELECT node, min(lbl) AS lbl FROM (
    SELECT node, lbl FROM r{j}
    UNION ALL
    SELECT s.b AS node, l.lbl FROM sym s JOIN r{j} l ON l.node = s.a
  ) GROUP BY node
)"""


@q("g33_cc_two_phase", f"""
WITH nodes AS (SELECT c_custkey AS k FROM customer),
ch AS (
  SELECT a.k AS a, a.k + 1 AS b
  FROM nodes a JOIN nodes c ON c.k = a.k + 1
  WHERE a.k % 8 <> 7 AND {_G33_RNG.format(p='cc')} < 0.7
),
sk AS (
  SELECT a.k AS a, a.k + 2 AS b
  FROM nodes a JOIN nodes c ON c.k = a.k + 2
  WHERE a.k % 8 <= 5 AND {_G33_RNG.format(p='sk')} < 0.25
),
e AS MATERIALIZED (SELECT a, b FROM ch UNION ALL
                   SELECT a, b FROM sk),
sym AS MATERIALIZED (SELECT a, b FROM e UNION ALL
                     SELECT b AS a, a AS b FROM e),
r0 AS MATERIALIZED (SELECT k AS node, k AS lbl FROM nodes),
{",".join(_G33_ROUND.format(i=i, j=i - 1) for i in range(1, 8))},
comp AS (SELECT lbl AS component, count(*) AS sz
         FROM r7 GROUP BY lbl)
SELECT CAST(sz AS BIGINT) AS comp_size,
       CAST(count(*) AS BIGINT) AS n_components,
       CAST(sum(component % 1000000000) AS BIGINT) AS min_label_sum
FROM comp GROUP BY sz ORDER BY comp_size
""")
def g33_cc_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.graph import cc_two_phase
    from ecmm428_pycart_spark.datapipe.text import md5_uniform

    cust = _t(spark, sf_dir, "customer") \
        .select(F.col("c_custkey").alias("k"))
    k = F.col("k")

    def draw(prefix):
        return md5_uniform(F.concat(F.lit(prefix), k.cast("string")))

    cand = cust.select(
        k.alias("a"),
        F.when((k % 8 != 7) & (draw("cc") < 0.7), k + 1).alias("b1"),
        F.when((k % 8 <= 5) & (draw("sk") < 0.25), k + 2).alias("b2"))
    tgt = cust.select(k.alias("b"))
    edges = (cand.select("a", F.col("b1").alias("b"))
             .filter(F.col("b").isNotNull()).join(tgt, "b")
             .union(cand.select("a", F.col("b2").alias("b"))
                    .filter(F.col("b").isNotNull()).join(tgt, "b")))
    labels = cc_two_phase(edges, "a", "b")
    full = (cust.join(labels, cust.k == labels.node, "left")
            .select(k.alias("node"),
                    F.coalesce("component", k).alias("component")))
    comp = (full.groupBy("component")
            .agg(F.count(F.lit(1)).alias("sz")))
    return (comp.groupBy("sz")
            .agg(F.count(F.lit(1)).alias("n_components"),
                 F.sum(F.col("component") % 1000000000)
                 .alias("min_label_sum"))
            .select(F.col("sz").cast("long").alias("comp_size"),
                    F.col("n_components").cast("long")
                    .alias("n_components"),
                    F.col("min_label_sum").cast("long")
                    .alias("min_label_sum"))
            .orderBy("comp_size"))


# ---------------------------------------------------------------------------
# Inter-annotator agreement on the corpus (text.annotator_agreement
# — Cohen 1960, the label-QA gate a labeled training set runs before
# trusting its classes): two pseudo-annotators derive from a shared
# md5 "true" class (3 classes) with independent md5-gated noise
# (annotator a keeps truth w.p. 0.8, b w.p. 0.75, else an md5
# re-draw), so agreement is well above chance and every statistic is
# a pure integer function both engines replay. kappa ships UNDIVIDED
# (num, den) — the g31 negative-division discipline — beside po/pe
# floor-division ppms. 1-row aggregates meet in the documented
# single-row broadcast.
# ---------------------------------------------------------------------------
_D77_U = ("(CAST(concat('0x', substr(md5('{p}' || CAST(doc_id AS "
          "VARCHAR)), 1, 8)) AS UBIGINT) + 0.5) / 4294967296.0")
_D77_B = ("CAST(concat('0x', substr(md5('{p}' || CAST(doc_id AS "
          "VARCHAR)), 1, 8)) AS UBIGINT) % 3")


@q("d77_label_agreement", f"""
WITH lab AS (
  SELECT CASE WHEN {_D77_U.format(p='na')} < 0.8
              THEN {_D77_B.format(p='t')}
              ELSE {_D77_B.format(p='a')} END AS a,
         CASE WHEN {_D77_U.format(p='nb')} < 0.75
              THEN {_D77_B.format(p='t')}
              ELSE {_D77_B.format(p='b')} END AS b
  FROM documents
),
base AS (SELECT count(*) AS n_items,
                sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS n_agree
         FROM lab),
ma AS (SELECT a AS c, count(*) AS na FROM lab GROUP BY a),
mb AS (SELECT b AS c, count(*) AS nb FROM lab GROUP BY b),
sm AS (SELECT sum(na * nb) AS s, count(*) AS n_classes
       FROM ma JOIN mb USING (c))
SELECT CAST(n_items AS BIGINT) AS n_items,
       CAST(n_agree AS BIGINT) AS n_agree,
       CAST(n_classes AS BIGINT) AS n_classes,
       CAST(n_agree * 1000000 // n_items AS BIGINT) AS po_ppm,
       CAST(s * 1000000 // (n_items * n_items) AS BIGINT) AS pe_ppm,
       CAST(n_agree * n_items - s AS BIGINT) AS kappa_num,
       CAST(n_items * n_items - s AS BIGINT) AS kappa_den
FROM base, sm
""")
def d77_label_agreement(spark: SparkSession,
                        sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.text import (
        annotator_agreement, md5_bucket, md5_uniform)

    did = F.col("doc_id").cast("string")

    def u(p):
        return md5_uniform(F.concat(F.lit(p), did))

    def bkt(p):
        return md5_bucket(F.concat(F.lit(p), did), 3).cast("long")

    lab = _t(spark, sf_dir, "documents").select(
        F.when(u("na") < 0.8, bkt("t")).otherwise(bkt("a"))
        .alias("a"),
        F.when(u("nb") < 0.75, bkt("t")).otherwise(bkt("b"))
        .alias("b"))
    return annotator_agreement(lab, "a", "b")


# ---------------------------------------------------------------------------
# Inverted-index postings compression accounting (text.postings_
# varint_stats — the delta+LEB128 layout under every search/dedup
# index): the corpus tokenized on the single-space convention, one
# posting list per term, the REAL encoder runs and decodes back in
# an Arrow-batched UDF (refusing to emit on mismatch), and the gate
# rolls byte counts up by the term's md5 bucket. The oracle computes
# the SAME byte counts closed-form — LEB128 length is a pure CASE on
# the gap (1B < 2^7, 2B < 2^14, 3B < 2^21, else 4B here) over a
# lag-window of the sorted postings — so encoder length correctness
# is proved gap by gap, and the decoded id_sum proves the roundtrip.
# ---------------------------------------------------------------------------
@q("d78_postings_varint", """
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
ord AS (
  SELECT term, doc_id,
         lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id) AS prev
  FROM tok
),
per_term AS (
  SELECT term, count(*) AS n_postings, sum(doc_id) AS id_sum,
         sum(CASE
               WHEN coalesce(doc_id - prev, doc_id) < 128 THEN 1
               WHEN coalesce(doc_id - prev, doc_id) < 16384 THEN 2
               WHEN coalesce(doc_id - prev, doc_id) < 2097152 THEN 3
               ELSE 4 END) AS vbytes
  FROM ord GROUP BY term
)
SELECT CAST(CAST(concat('0x', substr(md5(term), 1, 8)) AS UBIGINT)
            % 16 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(n_postings) AS BIGINT) AS n_postings,
       CAST(sum(n_postings) * 8 AS BIGINT) AS raw_bytes,
       CAST(sum(vbytes) AS BIGINT) AS varint_bytes,
       CAST(sum(id_sum) % 1000000000 AS BIGINT) AS id_sum_mod
FROM per_term GROUP BY 1 ORDER BY bucket
""")
def d78_postings_varint(spark: SparkSession,
                        sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.text import (
        md5_bucket, postings_varint_stats, tokens)

    pairs = (_t(spark, sf_dir, "documents")
             .select("doc_id",
                     F.explode(tokens(F.col("text"))).alias("term")))
    st = postings_varint_stats(pairs, "term", "doc_id")
    return (st.groupBy(md5_bucket("term", 16).cast("long")
                       .alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_terms"),
                 F.sum("n_postings").alias("n_postings"),
                 (F.sum("n_postings") * 8).alias("raw_bytes"),
                 F.sum("varint_bytes").alias("varint_bytes"),
                 (F.sum("id_sum") % 1000000000).alias("id_sum_mod"))
            .select(F.col("bucket"),
                    F.col("n_terms").cast("long").alias("n_terms"),
                    F.col("n_postings").cast("long")
                    .alias("n_postings"),
                    F.col("raw_bytes").cast("long").alias("raw_bytes"),
                    F.col("varint_bytes").cast("long")
                    .alias("varint_bytes"),
                    F.col("id_sum_mod").cast("long")
                    .alias("id_sum_mod"))
            .orderBy("bucket"))


# ---------------------------------------------------------------------------
# Benford first-digit conformance over order totals (the classic
# forensic/data-quality screen: naturally-grown monetary amounts
# follow P(d) = log10(1 + 1/d); fabricated or truncated feeds
# don't): first digit of the cents amount, observed vs expected
# counts with the expectation as the standard rounded-ppm constants
# (they sum to exactly 1e6), and the integer chi-square contribution
# per digit (dev^2 * 1e6 // exp — squared numerator keeps the
# division nonnegative, the q114 discipline). N reaches each of the
# 9 digit rows through a bounded all-rows window (the zipf_fit
# convention), not a broadcast join.
# ---------------------------------------------------------------------------
_BENFORD_CASE = """CASE digit
  WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
  WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
  WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END"""


@q("q116_benford_digits", f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
e AS (
  SELECT digit, n, sum(n) OVER () AS n_total,
         ({_BENFORD_CASE}) * sum(n) OVER () // 1000000 AS exp_n
  FROM c
)
SELECT CAST(digit AS BIGINT) AS digit,
       CAST(n AS BIGINT) AS n_orders,
       CAST(exp_n AS BIGINT) AS expected_n,
       CAST(n - exp_n AS BIGINT) AS dev,
       CAST((n - exp_n) * (n - exp_n) * 1000000
            // greatest(exp_n, 1) AS BIGINT) AS chi2_ppm
FROM e ORDER BY digit
""")
def q116_benford_digits(spark: SparkSession,
                        sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("long")
    c = (_t(spark, sf_dir, "orders").select(digit.alias("digit"))
         .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    # 9-row frame: the all-rows window is bounded by construction.
    e = (c.withColumn("n_total", F.sum("n").over(W.partitionBy()))
         .withColumn("exp_n", F.expr(
             f"({_BENFORD_CASE}) * n_total div 1000000")))
    return (e.select(F.col("digit").cast("long").alias("digit"),
                     F.col("n").cast("long").alias("n_orders"),
                     F.col("exp_n").cast("long").alias("expected_n"),
                     (F.col("n") - F.col("exp_n")).cast("long")
                     .alias("dev"),
                     F.expr("(n - exp_n) * (n - exp_n) * 1000000 "
                            "div greatest(exp_n, 1)").cast("long")
                     .alias("chi2_ppm"))
            .orderBy("digit"))


# ---------------------------------------------------------------------------
# Degree assortativity in exact integers (Newman 2002's r over the
# queen grid — do high-degree nodes attach to high-degree nodes?):
# per directed edge the endpoint degrees (one degree aggregate + two
# key-equi joins back onto the edge list), then one row of moments:
# r = (M*S1 - S2^2) / (M*S3 - S2^2) with S1 = sum(du*dv),
# S2 = sum(du), S3 = sum(du^2). Numerator can be negative (grids
# are locally disassortative at the rim), so r ships UNDIVIDED as
# (r_num, r_den) — the g31/d77 discipline. Oracle = the g32
# closed-form grid edges, same moments.
# ---------------------------------------------------------------------------
@q("g34_degree_assortativity", """
WITH p AS (
  SELECT CAST(ceiling(sqrt(count(*))) AS BIGINT) AS side FROM customer
),
g AS (
  SELECT c_custkey AS k, c_custkey % side AS gx, c_custkey // side AS gy
  FROM customer, p
),
e AS (
  SELECT a.k AS a, b.k AS b
  FROM g a JOIN g b
    ON (a.k < b.k AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1)
),
und AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
deg AS (SELECT a AS k, count(*) AS d FROM und GROUP BY a),
j AS (
  SELECT da.d AS du, db.d AS dv
  FROM und JOIN deg da ON da.k = und.a JOIN deg db ON db.k = und.b
)
SELECT CAST(count(*) AS BIGINT) AS m_directed,
       CAST(sum(du * dv) AS BIGINT) AS s1,
       CAST(sum(du) AS BIGINT) AS s2,
       CAST(sum(du * du) AS BIGINT) AS s3,
       CAST(count(*) * sum(du * dv) - sum(du) * sum(du) AS BIGINT)
         AS r_num,
       CAST(count(*) * sum(du * du) - sum(du) * sum(du) AS BIGINT)
         AS r_den
FROM j
""")
def g34_degree_assortativity(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.benchmarks.geo_queries import _customer_grid
    from ecmm428_pycart_spark.operators.borders import get_borders

    grid = _customer_grid(spark, sf_dir).drop("value")
    borders, _ = get_borders(grid, "region_idx", "geometry",
                             idx_field="region_idx")
    und = borders.select(F.col("focal").alias("a"),
                         F.col("neighbor").alias("b"))
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d")) \
        .withColumnRenamed("a", "k")
    j = (und.join(deg.select(F.col("k").alias("a"),
                             F.col("d").alias("du")), "a")
         .join(deg.select(F.col("k").alias("b"),
                          F.col("d").alias("dv")), "b"))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("m_directed"),
        F.sum(F.col("du") * F.col("dv")).cast("long").alias("s1"),
        F.sum("du").cast("long").alias("s2"),
        F.sum(F.col("du") * F.col("du")).cast("long").alias("s3"),
        (F.count(F.lit(1)) * F.sum(F.col("du") * F.col("dv"))
         - F.sum("du") * F.sum("du")).cast("long").alias("r_num"),
        (F.count(F.lit(1)) * F.sum(F.col("du") * F.col("du"))
         - F.sum("du") * F.sum("du")).cast("long").alias("r_den"))


# ---------------------------------------------------------------------------
# Good-Turing frequency-of-frequencies (Good 1953 — the smoothing
# table every n-gram LM and vocabulary-coverage estimate starts
# from): token counts, then N_r = how many distinct tokens occur
# exactly r times, each row carrying its probability mass r * N_r
# and the Good-Turing adjusted-count NUMERATOR (r+1) * N_{r+1}
# (the denominator is the row's own N_r — division never crosses
# the engines). N_{r+1} arrives by a key-equi self-join of the
# frequency table on r+1 (frequency-of-frequency tables are
# dimension-sized: O(distinct counts), never O(vocab)); the page is
# the 20 SMALLEST OBSERVED r values — the head where smoothing
# actually applies. Deriving the cap from the observed spectrum
# (orderBy+limit on the dimension-sized ff, then a broadcast
# equi-join back) instead of a fixed `r <= 20` keeps the page
# non-empty at every corpus scale: on a corpus where every token
# occurs > 20 times a fixed cap returns 0 rows and the
# join/coalesce logic is never exercised (VERDICT r7 finding #1).
# r values are distinct by construction (ff groups by r), so the
# ordered limit is deterministic.
# ---------------------------------------------------------------------------
@q("d79_good_turing", """
WITH tc AS (
  SELECT tok, count(*) AS r
  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents)
  GROUP BY tok
),
ff AS (SELECT r, count(*) AS n_r FROM tc GROUP BY r),
keep AS (SELECT r FROM ff ORDER BY r LIMIT 20)
SELECT CAST(f.r AS BIGINT) AS r,
       CAST(f.n_r AS BIGINT) AS n_tokens,
       CAST(f.r * f.n_r AS BIGINT) AS mass,
       CAST(coalesce((f.r + 1) * g.n_r, 0) AS BIGINT) AS gt_num
FROM ff f JOIN keep USING (r) LEFT JOIN ff g ON g.r = f.r + 1
ORDER BY r
""")
def d79_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.text import tokens

    tc = (_t(spark, sf_dir, "documents")
          .select(F.explode(tokens(F.col("text"))).alias("tok"))
          .groupBy("tok").agg(F.count(F.lit(1)).alias("r")))
    ff = tc.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    # 20 smallest observed r: TakeOrderedAndProject on the
    # dimension-sized ff, broadcast back as an equi-join key set
    keep = ff.select("r").orderBy("r").limit(20)
    nxt = ff.select((F.col("r") - 1).alias("r"),
                    F.col("n_r").alias("n_next"))
    return (ff.join(F.broadcast(keep), "r")
            .join(nxt, "r", "left")
            .select(F.col("r").cast("long").alias("r"),
                    F.col("n_r").cast("long").alias("n_tokens"),
                    (F.col("r") * F.col("n_r")).cast("long")
                    .alias("mass"),
                    F.coalesce((F.col("r") + 1) * F.col("n_next"),
                               F.lit(0)).cast("long").alias("gt_num"))
            .orderBy("r"))


# ---------------------------------------------------------------------------
# STREAMING value-distribution drift (streaming.stream_value_drift
# — the stateful twin of q114, closing the pairing the rolling-
# anomaly monitor started): per event_type the bucket -> (even-day,
# odd-day) count map accumulates in applyInPandasWithState across
# three time-ordered slices; every emission rescores the full map
# with the squared-numerator integer chi-square, and the final
# emission (per-key argmax of the strictly-increasing n_events) is
# slicing-invariant — the hand test proves 2-slice == 3-slice ==
# replay — so the batch q114 SQL is the exact oracle.
# ---------------------------------------------------------------------------
@q("st22_stream_value_drift", """
WITH v AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) % 2 AS half,
         CAST(floor(value * 100) AS BIGINT) // 2000 AS bucket
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
b AS (
  SELECT event_type, bucket,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c
  FROM v GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(a) AS BIGINT) AS n_even_days,
       CAST(sum(c) AS BIGINT) AS n_odd_days,
       CAST(sum((a - c) * (a - c) * 1000000 // (a + c)) AS BIGINT)
         AS chi2_ppm,
       CAST(max((a - c) * (a - c) * 1000000 // (a + c)) AS BIGINT)
         AS worst_bucket_ppm
FROM b GROUP BY event_type ORDER BY event_type
""")
def st22_stream_value_drift(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    import uuid

    from pyspark.sql import Window as W

    from ecmm428_pycart_spark.benchmarks.relational import (
        _await_stream, _scratch)
    from ecmm428_pycart_spark.streaming.events import (
        read_events_stream, stream_value_drift,
        write_time_ordered_stream_dir)

    ev = (_t(spark, sf_dir, "events")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    slices = [ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i)
              for i in range(3)]
    d = _scratch("st22_events_")
    write_time_ordered_stream_dir(slices, d)
    name = f"st22_{uuid.uuid4().hex[:8]}"
    _await_stream(
        spark,
        stream_value_drift(
            read_events_stream(spark, d, max_files_per_trigger=1),
            band_cents=2000)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True))
    fin = (spark.table(name)
           .withColumn("_rn", F.row_number().over(
               W.partitionBy("event_type")
               .orderBy(F.col("n_events").desc())))
           .filter(F.col("_rn") == 1))
    return (fin.select("event_type",
                       F.col("n_buckets").cast("long")
                       .alias("n_buckets"),
                       F.col("n_even_days").cast("long")
                       .alias("n_even_days"),
                       F.col("n_odd_days").cast("long")
                       .alias("n_odd_days"),
                       F.col("chi2_ppm").cast("long")
                       .alias("chi2_ppm"),
                       F.col("worst_bucket_ppm").cast("long")
                       .alias("worst_bucket_ppm"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# REAL gzip roundtrip over the corpus (multimodal.gzip_decompress_
# manual on stdlib-encoded members): decoded strlen + md5 pin the
# DEFLATE body exactly as m42 does, and MTIME — pinned to doc_id by
# the producer — surfaces in the gate as sum(doc_id), so the header
# walk (magic/FLG/optional fields) is proved closed-form too; the
# trailer's CRC-32 and ISIZE are verified in-UDF by the hand-rolled
# table-driven checksum before any row is emitted.
# ---------------------------------------------------------------------------
@q("m43_gzip_roundtrip", """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT
                % 1000000000) AS BIGINT) AS fp_sum,
       CAST(sum(doc_id) AS BIGINT) AS mtime_sum
FROM documents GROUP BY source
""")
def m43_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe import multimodal

    docs = _t(spark, sf_dir, "documents") \
        .select("doc_id", "source", "text")
    payload = docs.withColumn(
        "payload", multimodal.synth_gzip_payload(F.col("text"),
                                                 F.col("doc_id")))
    st = payload.withColumn(
        "s", multimodal.gzip_roundtrip_stats(F.col("payload")))
    return (st.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("s.n_bytes").cast("long").alias("total_bytes"),
                 F.sum(F.col("s.fp") % 1000000000).cast("long")
                 .alias("fp_sum"),
                 F.sum("s.mtime").cast("long").alias("mtime_sum")))


# ---------------------------------------------------------------------------
# Market-basket association rules (graph.association_rules — the
# Apriori support/confidence/lift readout on the g25 co-purchase
# base): customer baskets of distinct parts, over-degree baskets
# capped at 40 BEFORE the wedge join, metrics measured on the same
# capped incidence so they stay internally consistent. Support and
# confidences are exact ppm floor divisions; lift ships undivided
# (n_ab * n_baskets vs n_a * n_b). Top-20 pairs, deterministic
# (n_ab desc, a, b) order; the basket total reaches pair rows as
# the documented 1-row broadcast.
# ---------------------------------------------------------------------------
@q("q117_association_rules", """
WITH inc AS (
  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS v
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
deg AS (SELECT u, count(*) AS d FROM inc GROUP BY u),
kept AS (SELECT inc.* FROM inc JOIN deg USING (u) WHERE deg.d <= 40),
nb AS (SELECT count(DISTINCT u) AS n_baskets FROM kept),
item AS (SELECT v, count(*) AS n FROM kept GROUP BY v),
p AS (
  SELECT a.v AS a, b.v AS b, count(*) AS n_ab
  FROM kept a JOIN kept b ON a.u = b.u AND a.v < b.v
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(n_ab AS BIGINT) AS n_ab,
       CAST(ia.n AS BIGINT) AS n_a,
       CAST(ib.n AS BIGINT) AS n_b,
       CAST(n_ab * 1000000 // n_baskets AS BIGINT) AS support_ppm,
       CAST(n_ab * 1000000 // ia.n AS BIGINT) AS conf_ab_ppm,
       CAST(n_ab * 1000000 // ib.n AS BIGINT) AS conf_ba_ppm,
       CAST(n_ab * n_baskets AS BIGINT) AS lift_num,
       CAST(ia.n * ib.n AS BIGINT) AS lift_den
FROM p JOIN item ia ON ia.v = p.a JOIN item ib ON ib.v = p.b, nb
ORDER BY n_ab DESC, a ASC, b ASC LIMIT 20
""")
def q117_association_rules(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.graph import association_rules

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    inc = (orders.join(li, orders.o_orderkey == li.l_orderkey)
           .select(F.col("o_custkey").alias("u"),
                   F.col("l_partkey").alias("v")))
    out = association_rules(inc, max_src_degree=40, min_weight=2)
    cols = ["a", "b", "n_ab", "n_a", "n_b", "support_ppm",
            "conf_ab_ppm", "conf_ba_ppm", "lift_num", "lift_den"]
    return (out.select(*[F.col(c).cast("long").alias(c)
                         for c in cols])
            .orderBy(F.col("n_ab").desc(), F.col("a").asc(),
                     F.col("b").asc())
            .limit(20))


# ---------------------------------------------------------------------------
# Pairwise-similarity histogram (the embedding-collapse diagnostic a
# retrieval corpus runs before trusting its encoder: healthy spaces
# put random pairs near cos 0; a collapsed space piles mass at high
# cos): one md5-sampled partner per vector (j = md5 % n, i != j —
# n pairs, never a quadratic join), components floor-quantized to
# 1e-3 (engine-deterministic; keeps d^2 * 20 under int64), and the
# histogram keyed by (sign(dot), squared-cosine ventile
# d^2*20 // (|a|^2|b|^2)) — every statistic a pure integer. The
# vector count reaches the sampler as the documented 1-row
# broadcast.
# ---------------------------------------------------------------------------
@q("s30_similarity_histogram", """
WITH n AS (SELECT count(*) AS nv FROM embeddings),
pr AS (
  SELECT vec_id AS i, embedding AS ea,
         CAST(CAST(concat('0x', substr(md5('pt' ||
              CAST(vec_id AS VARCHAR)), 1, 8)) AS UBIGINT)
              % nv AS BIGINT) AS j
  FROM embeddings, n
),
z AS (
  SELECT pr.i, pr.j,
         CAST(floor(unnest(pr.ea)::DOUBLE * 1000) AS BIGINT) AS qa,
         CAST(floor(unnest(b.embedding)::DOUBLE * 1000) AS BIGINT)
           AS qb
  FROM pr JOIN embeddings b ON b.vec_id = pr.j
  WHERE pr.i <> pr.j
),
d AS (
  SELECT i, j, sum(qa * qb) AS dot,
         sum(qa * qa) AS na, sum(qb * qb) AS nb
  FROM z GROUP BY i, j
),
h AS (
  SELECT CASE WHEN dot > 0 THEN 1 WHEN dot < 0 THEN -1 ELSE 0 END
           AS sign,
         dot * dot * 20 // greatest(na * nb, 1) AS cos2_ventile,
         dot
  FROM d
)
SELECT CAST(sign AS BIGINT) AS sign,
       CAST(cos2_ventile AS BIGINT) AS cos2_ventile,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(dot) AS BIGINT) AS dot_sum
FROM h GROUP BY sign, cos2_ventile ORDER BY sign, cos2_ventile
""")
def s30_similarity_histogram(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select("vec_id",
                                                 "embedding")
    qv = F.transform(F.col("embedding"),
                     lambda x: F.floor(x.cast("double") * 1000)
                     .cast("long"))
    q_ = emb.select(F.col("vec_id").alias("i"), qv.alias("qa"))
    nv = q_.agg(F.count(F.lit(1)).alias("nv"))
    partner = (F.conv(F.substring(
        F.md5(F.concat(F.lit("pt"), F.col("i").cast("string"))),
        1, 8), 16, 10).cast("long") % F.col("nv"))
    pr = (q_.crossJoin(nv)
          .select("i", "qa", partner.alias("j"))
          .filter(F.col("i") != F.col("j")))
    b = q_.select(F.col("i").alias("j"), F.col("qa").alias("qb"))
    dot = F.aggregate(F.zip_with("qa", "qb", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda a, x: a + x)
    sq = (lambda c: F.aggregate(
        F.transform(F.col(c), lambda x: x * x),
        F.lit(0).cast("long"), lambda a, x: a + x))
    d = (pr.join(b, "j")
         .select(dot.alias("dot"), sq("qa").alias("na"),
                 sq("qb").alias("nb")))
    h = d.select(
        F.signum("dot").cast("long").alias("sign"),
        F.expr("dot * dot * 20 div greatest(na * nb, 1)")
        .alias("cos2_ventile"),
        "dot")
    return (h.groupBy("sign", "cos2_ventile")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum("dot").alias("dot_sum"))
            .select(F.col("sign").cast("long").alias("sign"),
                    F.col("cos2_ventile").cast("long")
                    .alias("cos2_ventile"),
                    F.col("n_pairs").cast("long").alias("n_pairs"),
                    F.col("dot_sum").cast("long").alias("dot_sum"))
            .orderBy("sign", "cos2_ventile"))


# ---------------------------------------------------------------------------
# Adaptive-filter PNG encode/decode roundtrip (multimodal.png_
# encode_adaptive — per-row minimum-sum-of-absolute-differences
# selection over ALL FIVE spec filters, the libpng heuristic; the
# first producer to exercise the decoder's Sub/Up/Average/Paeth
# grammar rather than filter-0 rows): pixels follow the closed form
# v(y,x,c) = ((id%9+1)*(x+2y) + 11c + (x*y)%7) % 256, so the oracle
# reproduces pixel count, value sum, and an x-weighted checksum by
# expanding the SAME formula over generate_series — no image bytes
# cross the oracle boundary, only arithmetic both engines share.
# ---------------------------------------------------------------------------
@q("m44_adaptive_png_roundtrip", """
WITH g AS (
  SELECT d.doc_id, d.source, y.i AS y, x.i AS x, c.i AS c
  FROM documents d,
       unnest(range(0, 16)) y(i),
       unnest(range(0, 16)) x(i),
       unnest(range(0, 3)) c(i)
),
v AS (
  SELECT source, x,
         ((doc_id % 9 + 1) * (x + 2 * y) + 11 * c + (x * y) % 7)
           % 256 AS val
  FROM g
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_pixels,
       CAST(sum(val) AS BIGINT) AS pix_sum,
       CAST(sum(val * (x + 1)) % 1000000000 AS BIGINT) AS xw_sum
FROM v GROUP BY source ORDER BY source
""")
def m44_adaptive_png_roundtrip(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe import multimodal

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    payload = docs.withColumn(
        "payload",
        multimodal.synth_adaptive_png_payload(F.col("doc_id")))
    st = payload.withColumn(
        "s", multimodal.adaptive_png_stats(F.col("payload")))
    return (st.groupBy("source")
            .agg(F.sum("s.n_pixels").cast("long").alias("n_pixels"),
                 F.sum("s.pix_sum").cast("long").alias("pix_sum"),
                 (F.sum("s.xw_sum") % 1000000000).cast("long")
                 .alias("xw_sum"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# Roaring-bitmap container accounting (Chambi/Lemire 2016 — the
# sizing pass behind every bitmap index): per return flag, the
# distinct orderkey set split into 2^16-value containers
# (key >> 16), each container choosing the spec's array layout
# (2 bytes/value, cardinality <= 4096) or bitmap layout (fixed 8 KiB)
# — exactly the decision rule the format applies (run containers
# omitted; they need the run-length pass this page is sizing).
# Two hash aggregates keyed on (flag, container); everything
# integer and closed-form in SQL.
# ---------------------------------------------------------------------------
@q("q118_roaring_containers", """
WITH s AS (
  SELECT DISTINCT l_returnflag AS flag, l_orderkey AS k
  FROM lineitem
),
c AS (
  SELECT flag, k // 65536 AS container, count(*) AS n
  FROM s GROUP BY 1, 2
),
t AS (
  SELECT flag,
         CASE WHEN n <= 4096 THEN 'array' ELSE 'bitmap' END AS ctype,
         n,
         CASE WHEN n <= 4096 THEN 2 * n ELSE 8192 END AS bytes
  FROM c
)
SELECT flag, ctype,
       CAST(count(*) AS BIGINT) AS n_containers,
       CAST(sum(n) AS BIGINT) AS n_values,
       CAST(sum(bytes) AS BIGINT) AS est_bytes
FROM t GROUP BY flag, ctype ORDER BY flag, ctype
""")
def q118_roaring_containers(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    s = (_t(spark, sf_dir, "lineitem")
         .select(F.col("l_returnflag").alias("flag"),
                 F.col("l_orderkey").alias("k"))
         .distinct())
    c = (s.groupBy("flag", F.expr("k div 65536").alias("container"))
         .agg(F.count(F.lit(1)).alias("n")))
    t = c.select(
        "flag",
        F.when(F.col("n") <= 4096, F.lit("array"))
        .otherwise(F.lit("bitmap")).alias("ctype"),
        "n",
        F.when(F.col("n") <= 4096, 2 * F.col("n"))
        .otherwise(F.lit(8192)).alias("bytes"))
    return (t.groupBy("flag", "ctype")
            .agg(F.count(F.lit(1)).cast("long").alias("n_containers"),
                 F.sum("n").cast("long").alias("n_values"),
                 F.sum("bytes").cast("long").alias("est_bytes"))
            .orderBy("flag", "ctype"))


# ---------------------------------------------------------------------------
# REAL WARC walk (multimodal.decode_warc_records — ISO 28500, the
# Common Crawl container): version line, case/order-insensitive
# header fields (fixtures alternate casing and order by record
# parity), Content-Length-framed payload slicing that never scans
# payload bytes for separators, and the mandatory two-CRLF record
# terminator. The oracle replays the generative closed forms:
# K = id%3+1 records, payload byte (97+(id+j)%26) x ((id%17)+3j+5),
# host (id//7)%5 (floor-div so hosts VARY within a source under the
# corpus's stride-20 source assignment).
# ---------------------------------------------------------------------------
@q("m50_warc_record_stats", """
WITH d AS (SELECT doc_id, source, doc_id % 3 + 1 AS k FROM documents),
r AS (
  SELECT d.doc_id, d.source, j.j,
         (d.doc_id % 17) + 3 * j.j + 5 AS len,
         97 + (d.doc_id + j.j) % 26 AS c
  FROM d, unnest(range(0, d.k)) j(j)
),
a AS (
  SELECT doc_id, source,
         count(*) AS n_rec,
         sum(CASE WHEN j % 2 = 0 THEN 1 ELSE 0 END) AS n_resp,
         sum(len) AS content,
         sum(c * len) AS psum
  FROM r GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_rec) AS BIGINT) AS total_records,
       CAST(sum(n_resp) AS BIGINT) AS n_responses,
       CAST(sum(content) AS BIGINT) AS total_content,
       CAST(sum(psum) AS BIGINT) AS payload_sum,
       CAST(count(DISTINCT 'host' || CAST((doc_id // 7) % 5 AS VARCHAR))
            AS BIGINT) AS n_hosts
FROM a GROUP BY source
""")
def m50_warc_record_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe import multimodal

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    payload = docs.withColumn(
        "payload", multimodal.synth_warc_payload(F.col("doc_id")))
    st = payload.withColumn(
        "s", multimodal.warc_record_stats(F.col("payload")))
    return (st.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("s.n_records").cast("long")
                 .alias("total_records"),
                 F.sum("s.n_responses").cast("long")
                 .alias("n_responses"),
                 F.sum("s.total_content").cast("long")
                 .alias("total_content"),
                 F.sum("s.payload_sum").cast("long")
                 .alias("payload_sum"),
                 F.countDistinct("s.first_host").cast("long")
                 .alias("n_hosts")))


# ---------------------------------------------------------------------------
# Temperature-scaled domain mixing weights (text.mixing_weights —
# Lample & Conneau 2019 §3.1 alpha-smoothed multilingual sampling,
# alpha = 1/2): w_i ∝ sqrt(p_i), emitted as exact-integer ppm via
# floor(sqrt(n)) (IEEE sqrt correctly rounded, n << 2^52) and BIGINT
# floor division — no float crosses the compare. One corpus groupBy
# plus a 1-row total broadcast.
# ---------------------------------------------------------------------------
@q("d91_mixing_weights", """
WITH c AS (
  SELECT source,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
s AS (SELECT source, n_tokens,
             CAST(floor(sqrt(n_tokens)) AS BIGINT) AS sq FROM c),
t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS n_tot,
             CAST(sum(sq) AS BIGINT) AS s_tot FROM s)
SELECT source, n_tokens,
       CAST(n_tokens * 1000000 // n_tot AS BIGINT) AS p_ppm,
       CAST(sq * 1000000 // s_tot AS BIGINT) AS w_ppm
FROM s, t
""")
def d91_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.text import mixing_weights
    return mixing_weights(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Positional duplicated-span detection (dedup.dup_span_stats — the
# Lee et al. 2022 arXiv:2107.06499 exact-substring dedup signal over
# word 8-grams): a position is duplicated when its 8-gram occurs in
# >= 2 documents (df capped at 64 — boilerplate grams are dropped,
# and documented as dropped, not silently all-pairs'd); spans are
# maximal runs of consecutive duplicated positions via the islands
# idiom under per-document windows. Grams shuffle as 16-hex md5
# prefixes, never as text. The corpus genuinely contains cross-doc
# verbatim spans (max_run ~80 at sf0.001), so the rollup is
# non-vacuous at every scale.
# ---------------------------------------------------------------------------
@q("d90_dup_spans", """
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
              FROM documents),
g AS (
  SELECT doc_id, source, i.i AS pos,
         substring(md5(array_to_string(t[i.i + 1:i.i + 8], ' ')),
                   1, 16) AS gh
  FROM toks, unnest(range(0, len(t) - 7)) i(i)
  WHERE len(t) >= 8
),
dupg AS (SELECT gh FROM g GROUP BY gh
         HAVING count(DISTINCT doc_id) BETWEEN 2 AND 64),
hits AS (SELECT g.doc_id, g.source, g.pos FROM g JOIN dupg USING (gh)),
runs AS (SELECT doc_id, source, pos,
                pos - row_number()
                      OVER (PARTITION BY doc_id ORDER BY pos) AS rid
         FROM hits),
pr AS (SELECT doc_id, source, rid, count(*) AS run_len
       FROM runs GROUP BY 1, 2, 3),
per AS (SELECT doc_id, source, sum(run_len) AS n_dup,
               max(run_len) AS mr
        FROM pr GROUP BY 1, 2)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs_dup,
       CAST(sum(n_dup) AS BIGINT) AS dup_positions,
       CAST(max(mr) AS BIGINT) AS max_run
FROM per GROUP BY source
""")
def d90_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.dedup import dup_span_stats

    docs = _t(spark, sf_dir, "documents")
    per = dup_span_stats(docs, n=8, max_df=64)
    return (per.join(docs.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs_dup"),
                 F.sum("n_dup_positions").cast("long")
                 .alias("dup_positions"),
                 F.max("max_run").cast("long").alias("max_run")))
