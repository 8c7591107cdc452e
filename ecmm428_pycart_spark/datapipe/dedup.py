"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hash math uses md5 (available and bit-identical in both Spark and
DuckDB) so every stage is oracle-checkable. Everything is native column
expressions — explode / groupBy / join — no Python UDFs:

- exact:    md5(text) hash-groupBy — one shuffle on the 128-bit hash.
- minhash:  shingle explode → per-doc min of k seeded hashes (map-side
            partial min, one shuffle on doc id).
- LSH:      band keys from the signature → self-join per band → distinct
            candidate pairs. Shuffle keys are band hashes: collision
            groups are the buckets, so join fan-out == true bucket sizes.
- jaccard:  exact verify on candidates via set intersect/union.
- simhash:  per-token 32-bit hash → per-bit ±1 sums → sign bits.

One deliberate exception to "no Python UDFs": cdc_chunks' cut-position
kernel is an Arrow-batched numpy convolution — Spark evaluates
higher-order array functions interpreted (no codegen) and projection
collapse re-inlines big expressions per reference, so the pure
expression form was ~75x slower; see the cdc_chunks docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from ecmm428_pycart_spark.datapipe.text import tokens

NUM_HASHES = 8
NUM_BANDS = 4          # bands of 2 hashes each
SIMHASH_BITS = 32


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Group identical texts; canonical id = min id per group."""
    return (df.select(id_col, F.md5(F.col(text_col)).alias("text_hash"))
            .groupBy("text_hash")
            .agg(F.count(F.lit(1)).alias("n_copies"),
                 F.min(id_col).alias("canonical_id")))


def window_dup_stats(df: DataFrame, window: int = 8,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact substring-window dedup — the scale-safe form of
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): slide a
    ``window``-token exact window over each doc, mark windows that
    occur in MORE THAN ONE distinct doc, report each doc's duplicated
    window count/fraction (the per-doc signal a span-removal pass
    consumes).

    Scale shape: windows are reduced to a 128-bit md5 before the
    shuffle (16 bytes/window instead of the window text; collisions
    are ~q²/2¹²⁸ for q distinct windows — negligible at 100 TB), the
    dup-window set is a groupBy count (a window shared by k docs costs
    O(k), never an O(k²) pair join), and the join back to positions is
    an equi-join on the hash. Docs shorter than ``window`` tokens have
    no windows and are excluded (sequence() would descend — same guard
    as shingle_set)."""
    toks = tokens(F.col(text_col))
    wins = (df.select(id_col, toks.alias("_t"))
            .filter(F.size("_t") >= window)
            .select(id_col, F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - (window - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("_t", i, window)))))
                .alias("wh")))
    dup = (wins.groupBy("wh")
           .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
           .filter(F.col("_nd") > 1)
           .select("wh"))
    flagged = wins.join(dup.withColumn("_dup", F.lit(1)), "wh", "left")
    return (flagged.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_windows"),
                 F.sum(F.coalesce(F.col("_dup"), F.lit(0)))
                 .alias("n_dup_windows"))
            .select(id_col, "n_windows", "n_dup_windows",
                    F.round(F.col("n_dup_windows")
                            / F.col("n_windows").cast("double"), 4)
                    .alias("dup_frac")))


def shingle_set(col, n: int = 1) -> Column:
    """Distinct word n-gram shingles of a text column (native exprs)."""
    t = tokens(col)
    if n == 1:
        return F.array_distinct(t)
    # docs with < n tokens must yield an EMPTY set: sequence(1, 0)
    # auto-steps DOWN in Spark ([1, 0]) and slice(t, 0, n) then raises
    idx = F.when(F.size(t) >= n,
                 F.sequence(F.lit(1), F.size(t) - (n - 1))
                 ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n))))


def minhash_signature(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      num_hashes: int = NUM_HASHES,
                      shingle_n: int = 1) -> DataFrame:
    """k-permutation MinHash: mh_s = min over shingles of md5('s:'+shingle).

    min() over md5 hex strings is a valid uniform permutation surrogate;
    md5 keeps it cross-engine deterministic.
    """
    sh = (df.select(id_col,
                    F.explode(shingle_set(F.col(text_col), shingle_n)).alias("sh")))
    aggs = [F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("sh")))).alias(f"mh{s}")
            for s in range(num_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_band_keys(sig: DataFrame, id_col: str = "doc_id",
                  num_bands: int = NUM_BANDS,
                  num_hashes: int = NUM_HASHES) -> DataFrame:
    """(id, band, band_key) — one row per band, key = md5 of the band's
    concatenated signature slice.

    Built as a single explode (NOT a union of per-band selects): one pass
    over the signature, and the downstream self-join sees two identical
    subplans, so Spark reuses the shuffle exchange instead of recomputing
    the signature per band per side.
    """
    rows_per_band = num_hashes // num_bands
    entries = []
    for b in range(num_bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        entries.append(F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *cols)).alias("band_key")))
    return (sig.select(F.col(id_col), F.explode(F.array(*entries)).alias("_b"))
            .select(id_col, F.col("_b.band").alias("band"),
                    F.col("_b.band_key").alias("band_key")))


MAX_BUCKET_SIZE = 64


def lsh_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        num_hashes: int = NUM_HASHES,
                        num_bands: int = NUM_BANDS,
                        shingle_n: int = 1,
                        max_bucket_size: int = MAX_BUCKET_SIZE) -> DataFrame:
    """Unordered candidate pairs (doc_a < doc_b) sharing ≥1 LSH band.

    Buckets larger than ``max_bucket_size`` are dropped before the
    self-join: an over-full bucket means the band signature carries no
    discriminative information (e.g. a tiny shared vocabulary), and its
    pairs would blow up quadratically — the standard web-scale dedup
    guard, and the skew protection that keeps the shuffle bounded. The
    cap is applied identically in the DuckDB oracle.
    """
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingle_n)
    bands = lsh_band_keys(sig, id_col, num_bands, num_hashes)
    ok = (bands.groupBy("band", "band_key")
          .agg(F.count(F.lit(1)).alias("_n"))
          .filter(F.col("_n") <= max_bucket_size)
          .select("band", "band_key"))
    bands = bands.join(ok, ["band", "band_key"], "left_semi")
    a = bands.select(F.col(id_col).alias("doc_a"), "band", "band_key")
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    return (a.join(b, ["band", "band_key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())


def jaccard_pairs(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", shingle_n: int = 1,
                  threshold: float = 0.5, round_decimals: int = 4,
                  hash_shingles: bool = False) -> DataFrame:
    """Exact Jaccard verify over candidate pairs (doc_a, doc_b).

    The similarity is rounded *before* thresholding so the boundary is
    reproducible across engines/float orders.

    ``hash_shingles`` replaces each shingle string with a 60-bit
    md5-prefix integer before the set ops — array_intersect over longs
    instead of multi-word strings, a large constant-factor win when
    shingle sets are big (the standard hashed-shingle formulation of
    Jaccard; Broder's original uses hashed shingles throughout). The
    hash is engine-reproducible (DuckDB: ('0x' || substr(md5(s), 1,
    15))::BIGINT), so oracles stay hash-checkable."""
    from ecmm428_pycart_spark.session import spread_cpu, spread_small

    sset = shingle_set(F.col(text_col), shingle_n)
    if hash_shingles:
        sset = F.transform(
            sset,
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
            .cast("long"))
    # spread the shingle-set build too: it feeds BROADCAST exchanges
    # (built once, ReusedExchange for the second side), and on a
    # single-file scan the whole per-doc shingle+md5 hashing otherwise
    # runs as ONE task (r13c profile: 1.8s of d28's 2.05s quiet-host).
    # spread_small = no-op at scale; the exchange moves (id, text).
    sets = spread_small(df.select(F.col(id_col), F.col(text_col))) \
        .select(F.col(id_col).alias("_sid"), sset.alias("_sset"))
    # spread the pair stream before the verify: the shingle sets attach
    # via broadcast joins, so the intersect/union CPU runs at the pair
    # stream's partitioning — which AQE coalesces by BYTES (two ids per
    # row) to a handful of tasks. The explicit exchange is two longs
    # per row; the verify it feeds is O(|set_a| + |set_b|) array ops
    # per row (r13b A/B: d28 2.04x — docs/AB_SPREAD_r13.md).
    j = (spread_cpu(pairs)
         .join(sets.withColumnRenamed("_sid", "doc_a")
                   .withColumnRenamed("_sset", "set_a"), "doc_a")
         .join(sets.withColumnRenamed("_sid", "doc_b")
                   .withColumnRenamed("_sset", "set_b"), "doc_b"))
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("double")
    union = F.size(F.array_union("set_a", "set_b")).cast("double")
    return (j.withColumn("jaccard", F.round(inter / union, round_decimals))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over token multiset: bit_i = [Σ_tokens (±1) > 0]."""
    tok = df.select(id_col, F.explode(tokens(F.col(text_col))).alias("tok"))
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    tok = tok.withColumn("h", h)
    sums = tok.groupBy(id_col).agg(*[
        F.sum(F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{i}")
        for i in range(bits)])
    acc = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        acc = term if acc is None else acc + term
    return sums.select(id_col, acc.cast("long").alias("simhash"))


def banded_hamming_pairs(hashes: DataFrame, hash_cols: list,
                         id_col: str = "doc_id",
                         max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by byte-band blocking over one or more 32-bit
    hash columns: a pair within hamming <= (n_bytes - 1) must collide
    in at least one byte band (pigeonhole), so the self-join shuffles
    on (band, byte) buckets — never all pairs — and survivors get the
    exact bit_count(xor) Hamming summed across the hash columns.

    The pigeonhole guarantee is a HARD recall bound: asking for
    max_hamming >= the band count would silently under-report pairs,
    so it raises instead. Shared by text SimHash and image dHash
    (one family, two modalities)."""
    n_bands = 4 * len(hash_cols)
    if max_hamming >= n_bands:
        raise ValueError(
            f"banded blocking with {n_bands} byte bands only guarantees "
            f"recall for hamming <= {n_bands - 1}, got {max_hamming}")
    entries = []
    for ci, col in enumerate(hash_cols):
        for b in range(4):
            entries.append(F.struct(
                F.lit(ci * 4 + b).alias("band"),
                F.shiftright(col, b * 8).bitwiseAND(F.lit(0xFF))
                .alias("band_val")))
    bands = (hashes.select(id_col, *hash_cols,
                           F.explode(F.array(*entries)).alias("_b"))
             .select(id_col, *hash_cols, F.col("_b.band").alias("band"),
                     F.col("_b.band_val").alias("band_val")))
    a = bands.select(F.col(id_col).alias("doc_a"), "band", "band_val",
                     *[F.col(c).alias(f"_a_{c}") for c in hash_cols])
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "band_val",
                     *[F.col(c).alias(f"_b_{c}") for c in hash_cols])
    cand = (a.join(b, ["band", "band_val"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .drop("band", "band_val").distinct())
    ham = None
    for c in hash_cols:
        piece = F.bit_count(F.col(f"_a_{c}").bitwiseXOR(F.col(f"_b_{c}")))
        ham = piece if ham is None else ham + piece
    return (cand.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def simhash_neardup_pairs(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: byte-band blocking + exact
    bit_count(xor) hamming (banded_hamming_pairs over the 32-bit
    fingerprint)."""
    sh = simhash(df, id_col, text_col)
    return banded_hamming_pairs(sh, ["simhash"], id_col=id_col,
                                max_hamming=max_hamming)


# ---------------------------------------------------------------------------
# Bloom-filter prefilter (round 4). d25 broadcasts the full eval
# shingle SET; at web scale that set can be 10^9+ n-grams — too big to
# broadcast — while a Bloom filter of it is a few hundred MB at a 1%
# false-positive rate regardless of string sizes. bloom_build folds the
# keys into a word-indexed bitmap with ONE aggregate (<= m/64 rows);
# bloom_prefilter tests membership with k map-side broadcast joins —
# zero shuffle of the probe side, no explode, no distinct. False
# positives are expected (callers exact-confirm the survivors, now a
# tiny join); false negatives are impossible, which a unit test pins.
# ---------------------------------------------------------------------------

def containment_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      max_df: int = 16,
                      min_inter: int = 2) -> DataFrame:
    """ASYMMETRIC n-gram containment candidates (Broder 1997's other
    resemblance measure): pairs sharing >= ``min_inter`` distinct word
    n-grams, with both set sizes, so callers derive
    C(A->B) = inter / |ngrams(A)| — near 1 when A is quoted/embedded
    inside a larger B, which symmetric Jaccard dilutes toward 0. The
    partial-copy detector (quotes, boilerplate-wrapped reposts,
    truncated mirrors) that complements d28's Jaccard near-dup.

    Scale shape: inverted-index self-join on the gram, NEVER all
    pairs — but gram posting lists are the hub risk, so grams seen in
    more than ``max_df`` docs are dropped BEFORE the join (the LSH
    MAX_BUCKET_SIZE / g21 hub-cap discipline), bounding pair
    generation at |grams| * max_df^2 while only silencing
    boilerplate-frequent grams that carry no pair-specific signal.
    The intersection is counted over capped grams only; denominators
    |ngrams(.)| stay FULL-set (the containment a cap-unaware reader
    expects), so reported containment is a provable LOWER bound.
    All-integer outputs (a, b, inter, n_a, n_b)."""
    g = (df.select(F.col(id_col).alias("_id"),
                   F.explode(shingle_set(F.col(text_col), n))
                   .alias("_g")))
    sizes = g.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    kept = g.join(g.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
                  .filter(F.col("_df") <= max_df).select("_g"), "_g")
    pairs = (kept.select(F.col("_g"), F.col("_id").alias("_a"))
             .join(kept.select(F.col("_g"), F.col("_id").alias("_b")),
                   "_g")
             .filter(F.col("_a") < F.col("_b"))
             .groupBy("_a", "_b")
             .agg(F.count(F.lit(1)).alias("inter"))
             .filter(F.col("inter") >= min_inter))
    return (pairs
            .join(sizes.select(F.col("_id").alias("_a"),
                               F.col("_sz").alias("n_a")), "_a")
            .join(sizes.select(F.col("_id").alias("_b"),
                               F.col("_sz").alias("n_b")), "_b")
            .select(F.col("_a").alias("a"), F.col("_b").alias("b"),
                    "inter", "n_a", "n_b"))


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8,
                        w: int = 4) -> DataFrame:
    """MOSS winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    2003): normalize (casefold + strip EVERY non-alphanumeric char,
    whitespace included), hash each character ``k``-gram, slide a
    ``w``-hash window and keep each window's minimum. The winnowing
    guarantee: any substring match of length >= k + w - 1 yields at
    least one identical selected fingerprint on both sides, at ~2/(w+1)
    selection density — the local document-fingerprinting scheme
    plagiarism/near-dup detectors build on. Output: one row per
    DISTINCT selected hash per doc (position multiplicity collapsed;
    pair matching joins on the hash, so the distinct-hash set is the
    join-ready unit).

    Determinism: the window argmin breaks hash ties by position via a
    single integer pack — 40-bit md5-prefix hash * 2^22 + position
    (62 bits total; docs up to 4M normalized chars) — so both engines
    select identical fingerprints with no float or sort ambiguity.
    Trailing windows shorter than ``w`` are clipped (position cap
    greatest(n_grams - w + 1, 1)); a doc with fewer than ``w`` grams
    contributes the minimum over all its grams, and one shorter than
    ``k`` chars contributes nothing.

    Scale shape: ENTIRELY map-side — grams, hash packs, window minima
    and the per-doc distinct are array expressions over each row
    (O(len * w) per doc, ``w`` tiny); no shuffle, no window operator,
    no UDF. A 100 TB corpus fingerprints in one scan; callers only
    ever shuffle the emitted (doc, hash) rows, already thinned to
    ~2/(w+1) of gram volume."""
    pos_bits = 4194304  # 2^22
    d = (df.select(F.col(id_col),
                   F.regexp_replace(F.lower(F.col(text_col)),
                                    "[^a-z0-9]", "").alias("_s"))
         .withColumn("_ng", F.length("_s") - F.lit(k - 1)))
    packed = F.expr(
        f"CASE WHEN _ng >= 1 THEN transform(sequence(1, _ng), "
        f"i -> cast(conv(substring(md5(substring(_s, i, {k})), 1, 10), "
        f"16, 10) AS BIGINT) * {pos_bits} + i) "
        f"ELSE cast(array() AS array<bigint>) END")
    fps = F.expr(
        f"CASE WHEN _ng >= 1 THEN array_distinct(transform("
        f"sequence(1, greatest(_ng - {w - 1}, 1)), "
        f"p -> array_min(slice(_packed, p, {w})) div {pos_bits})) "
        f"ELSE cast(array() AS array<bigint>) END")
    return (d.withColumn("_packed", packed)
            .select(F.col(id_col), F.explode(fps).alias("fp")))


def winnow_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 8, w: int = 4,
                     max_df: int = 16, min_shared: int = 2) -> DataFrame:
    """Near-dup candidate pairs via shared winnowing fingerprints —
    the MOSS matching stage over ``winnow_fingerprints``. Same
    inverted-index discipline as ``containment_pairs``: fingerprints
    seen in more than ``max_df`` docs are dropped BEFORE the self-join
    (boilerplate-frequent k-grams carry no pair-specific signal),
    bounding pair generation at |fingerprints| * max_df^2; shared
    counts use capped fingerprints only while denominators n_a/n_b
    stay FULL-set distinct-fingerprint counts, so derived similarity
    shared/min(n_a, n_b) is a provable lower bound. All-integer
    output (a, b, shared, n_a, n_b).

    The fingerprint stream is eagerly checkpointed before fan-out:
    three downstream consumers read it (per-doc sizes, the df count,
    and the capped join's probe side), and the char-8-gram hash +
    window-argmin pass is the measured wall (2.9s of d60's ~5s at
    sf0.1, paid once per consumer without materialization —
    tools/profile_d60_d28.py). The stream is O(chars/w) rows per
    document — corpus-linear, executor-local — the same bounded
    materialization economics as q95's corpus checkpoint and the CC
    kernel's edge projection."""
    from ecmm428_pycart_spark.session import spread_small
    fp = (winnow_fingerprints(spread_small(df.select(id_col, text_col)),
                              id_col=id_col, text_col=text_col,
                              k=k, w=w)
          .select(F.col(id_col).alias("_id"), F.col("fp").alias("_fp"))
          .localCheckpoint(eager=True))
    sizes = fp.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    kept = fp.join(fp.groupBy("_fp").agg(F.count(F.lit(1)).alias("_df"))
                   .filter(F.col("_df") <= max_df).select("_fp"), "_fp")
    pairs = (kept.select(F.col("_fp"), F.col("_id").alias("_a"))
             .join(kept.select(F.col("_fp"), F.col("_id").alias("_b")),
                   "_fp")
             .filter(F.col("_a") < F.col("_b"))
             .groupBy("_a", "_b")
             .agg(F.count(F.lit(1)).alias("shared"))
             .filter(F.col("shared") >= min_shared))
    return (pairs
            .join(sizes.select(F.col("_id").alias("_a"),
                               F.col("_sz").alias("n_a")), "_a")
            .join(sizes.select(F.col("_id").alias("_b"),
                               F.col("_sz").alias("n_b")), "_b")
            .select(F.col("_a").alias("a"), F.col("_b").alias("b"),
                    "shared", "n_a", "n_b"))


def _bloom_position_sql(col: str, m_bits: int, i: int) -> str:
    """SQL for bit position i of a key: xxhash64 seeded with i, folded
    to [0, m). Kept as a SQL string so callers can splice it into
    derived expressions (word index, in-word mask)."""
    return f"pmod(xxhash64({col}, {i}), {m_bits})"


def bloom_build(keys: DataFrame, col: str,
                m_bits: int = 1 << 20, k: int = 3) -> DataFrame:
    """Aggregate distinct keys into a Bloom bitmap as (word, bits) rows:
    word = bit_position >> 6, bits = OR of the in-word masks. Only
    non-zero words materialize, so the result is at most m_bits/64 rows
    of 16 bytes — broadcastable far beyond the point where the key set
    itself is not."""
    pos = (keys.select(F.explode(F.array(
        *[F.expr(_bloom_position_sql(col, m_bits, i)) for i in range(k)]))
        .alias("pos")))
    return (pos.select(
        F.shiftright("pos", 6).alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))")
        .alias("mask"))
        .groupBy("word").agg(F.bit_or("mask").alias("bits")))


def bloom_prefilter(df: DataFrame, col: str, bloom: DataFrame,
                    m_bits: int = 1 << 20, k: int = 3) -> DataFrame:
    """Keep only rows whose `col` value hits ALL k Bloom positions.

    k broadcast hash joins against the (word, bits) table — per-row,
    map-side, no shuffle of df; a missing word row is a definite miss.
    Output = df rows that are possibly-in-the-set (superset of the true
    matches; exact-confirm downstream)."""
    out = df
    for i in range(k):
        p = _bloom_position_sql(col, m_bits, i)
        w, m, b = f"_bw{i}", f"_bm{i}", f"_bb{i}"
        side = F.broadcast(bloom.select(F.col("word").alias(w),
                                        F.col("bits").alias(b)))
        out = (out.withColumn(w, F.expr(f"shiftright({p}, 6)"))
               .withColumn(m, F.expr(
                   f"shiftleft(CAST(1 AS BIGINT), "
                   f"CAST(pmod({p}, 64) AS INT))"))
               .join(side, on=w, how="left")
               .filter(F.col(b).isNotNull()
                       & (F.col(b).bitwiseAND(F.col(m)) != 0))
               .drop(w, m, b))
    return out


def source_contamination(df: DataFrame, n: int = 3,
                         min_shared: int = 10,
                         source_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Cross-source n-gram contamination matrix: for every source pair,
    the number of shared distinct word n-grams and the containment
    ratio (shared / smaller side) — the corpus-forensics pass that
    catches one source republishing another (mirrors, scrapes, eval
    benchmarks leaking into crawl slices) before anything trains.

    Plan: one explode+distinct collapses the corpus to (source,
    shingle) — the heavy reduction, map-side combined; the pair
    overlap is a self-join on the shingle key. Join fan-out per
    shingle is bounded by C(n_sources, 2): sources are a dimension
    (tens-hundreds), so the output and the per-key work stay bounded
    no matter how big the corpus gets. ``min_shared`` prunes the
    long tail of coincidental overlaps. Containment (not Jaccard)
    because a small source fully copied into a huge one should score
    ~1, not ~0. Returns (src_a, src_b, n_shared, containment),
    src_a < src_b.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    sh = (df.select(F.col(source_col).alias("src"),
                    F.explode(shingle_set(F.col(text_col), n)).alias("g"))
          .distinct())
    tot = sh.groupBy("src").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("src").alias("src_a"), "g")
    b = sh.select(F.col("src").alias("src_b"), "g")
    ov = (a.join(b, "g")
          .filter(F.col("src_a") < F.col("src_b"))
          .groupBy("src_a", "src_b")
          .agg(F.count(F.lit(1)).alias("n_shared"))
          .filter(F.col("n_shared") >= min_shared))
    ta = tot.select(F.col("src").alias("src_a"),
                    F.col("n_shingles").alias("na"))
    tb = tot.select(F.col("src").alias("src_b"),
                    F.col("n_shingles").alias("nb"))
    return (ov.join(F.broadcast(ta), "src_a")
            .join(F.broadcast(tb), "src_b")
            .select("src_a", "src_b", "n_shared",
                    F.round(F.col("n_shared")
                            / F.least("na", "nb"), 6).alias("containment")))


def save_band_index(df: DataFrame, path: str, id_col: str = "doc_id",
                    text_col: str = "text",
                    num_hashes: int = NUM_HASHES,
                    num_bands: int = NUM_BANDS,
                    shingle_n: int = 1,
                    max_bucket: int = MAX_BUCKET_SIZE) -> None:
    """Persist a corpus's LSH band index as parquet — the artifact
    INCREMENTAL ingestion dedups against, so tomorrow's batch never
    re-reads (or re-hashes) today's corpus text. Rows are
    (id, band, band_key); degenerate buckets (> ``max_bucket`` members
    within one (band, band_key)) are dropped AT BUILD, the same
    boilerplate-bucket cap lsh_candidate_pairs applies — a shared
    header slamming millions of docs into one bucket would otherwise
    turn every future batch-join into a hot-key blowup. Partitioned by
    band so an incremental probe prunes to the bands it touches."""
    from pyspark.sql import Window

    bands = lsh_band_keys(
        minhash_signature(df, id_col=id_col, text_col=text_col,
                          num_hashes=num_hashes, shingle_n=shingle_n),
        id_col=id_col, num_bands=num_bands, num_hashes=num_hashes)
    w = Window.partitionBy("band", "band_key")
    pruned = (bands.withColumn("_n", F.count(F.lit(1)).over(w))
              .filter(F.col("_n") <= max_bucket).drop("_n"))
    pruned.write.mode("overwrite").partitionBy("band").parquet(path)


def incremental_dup_candidates(new_df: DataFrame, index_path: str,
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               num_hashes: int = NUM_HASHES,
                               num_bands: int = NUM_BANDS,
                               shingle_n: int = 1) -> DataFrame:
    """Near-duplicate candidates of an INCOMING batch against a stored
    corpus index (save_band_index) — the incremental-ingestion shape:
    the new batch is hashed fresh (it is the small side), the corpus
    contributes only its persisted (id, band, band_key) rows, and the
    join key is the band bucket, so the shuffle is
    O(batch + touched index rows), never corpus-sized. Returns
    distinct (id, existing_id) candidate pairs; verify with
    jaccard_pairs against the corpus text if exact similarity is
    needed (candidates are a superset, the standard LSH contract)."""
    spark = new_df.sparkSession
    idx = (spark.read.parquet(index_path)
           .select(F.col(id_col).alias("existing_id"), "band", "band_key"))
    new_bands = lsh_band_keys(
        minhash_signature(new_df, id_col=id_col, text_col=text_col,
                          num_hashes=num_hashes, shingle_n=shingle_n),
        id_col=id_col, num_bands=num_bands, num_hashes=num_hashes)
    return (new_bands.join(idx, ["band", "band_key"])
            .select(id_col, "existing_id").distinct())


def edit_neardup_pairs(df: DataFrame, max_dist: int = 8,
                       prefix_len: int = 12, length_bucket: int = 20,
                       block_cap: int = 50, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Edit-distance near-duplicate pairs via prefix/length blocking —
    the record-linkage classic (Levenshtein under a blocking key) that
    catches single-typo boilerplate MinHash's token shingles can miss.

    Scale shape: normalize (map-side), block on (floor(len/LB),
    norm[:prefix_len]) — a typo inside the prefix moves the doc to a
    different block, the accepted recall trade of prefix blocking —
    cap each block at ``block_cap`` rows (row_number over the block
    key, id-ordered, the MAX_BUCKET_SIZE convention from the LSH
    pass), then a self-join ON THE BLOCK KEY ONLY: candidate volume is
    bounded by blocks x cap^2, never corpus^2. The distance itself is
    Spark's bounded levenshtein(l, r, threshold) — the banded O(d x n)
    algorithm, returning -1 past the bound instead of filling the full
    DP matrix (DuckDB computes the full distance and filters; same
    surviving pairs)."""
    from ecmm428_pycart_spark.datapipe.text import normalize_text
    n = df.select(id_col, normalize_text(F.col(text_col)).alias("_norm"))
    b = n.select(
        id_col, "_norm",
        F.floor(F.length("_norm") / length_bucket).cast("long")
        .alias("_lb"),
        F.substring("_norm", 1, prefix_len).alias("_pfx"))
    from pyspark.sql.window import Window
    w = (Window.partitionBy("_lb", "_pfx")
         .orderBy(F.col(id_col).asc()))
    capped = (b.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= block_cap).drop("_rn"))
    a = capped.select(F.col(id_col).alias("doc_a"),
                      F.col("_norm").alias("_na"), "_lb", "_pfx")
    c = capped.select(F.col(id_col).alias("doc_b"),
                      F.col("_norm").alias("_nb"), "_lb", "_pfx")
    return (a.join(c, ["_lb", "_pfx"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .withColumn("dist",
                        F.levenshtein("_na", "_nb", max_dist)
                        .cast("long"))
            .filter(F.col("dist") >= 0)
            .select("doc_a", "doc_b", "dist"))


CDC_B = 31                 # rolling-hash base
CDC_M = 1000003            # prime modulus (fits 63-bit window sums)
CDC_K = 16                 # rolling window (chars)
CDC_MASK = 64              # boundary when h % CDC_MASK == 0 (~64B chunks)


def _cdc_pow() -> list[int]:
    p, out = 1, []
    for _ in range(CDC_K):
        out.append(p)
        p = (p * CDC_B) % CDC_M
    return out


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def _cdc_cut_positions(texts):
    """Cut-position kernel for ``cdc_chunks``: per text, the sorted
    list [0, cuts..., len] where a cut is any 1-indexed byte position
    i in [CDC_K, len) whose trailing-window hash
    sum_j byte[i-j] * B^j mod M is divisible by CDC_MASK. The window
    sums for ALL positions are one ``np.convolve(codes, powers)`` —
    vectorized O(len * CDC_K), int64-safe (16 * 127 * M < 2^63)."""
    import numpy as np
    import pandas as pd
    pw = np.array(_cdc_pow(), dtype=np.int64)

    def cuts(s):
        if s is None:
            return None
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        n = len(b)
        if n < CDC_K:
            return [0, n]
        h = np.convolve(b.astype(np.int64), pw)[CDC_K - 1:n]
        # h[t] = hash of the window ENDING at 1-indexed pos t+CDC_K-1+1
        pos = np.nonzero(h % CDC_M % CDC_MASK == 0)[0] + CDC_K
        pos = pos[pos < n]
        return [0] + pos.tolist() + [n]

    return texts.map(cuts)


# Marked non-deterministic so the optimizer cannot DUPLICATE the kernel
# (optimization guide §4.4, the m19/m21 lesson): the caller's posexplode
# over `_chunks` makes InferFiltersFromGenerate synthesize a size()>0
# filter whose condition re-evaluates the whole convolve kernel in a
# SECOND ArrowEvalPython below the Generate (d62's plan carried both;
# pure function of the text, results unchanged).
_cdc_cut_positions = _cdc_cut_positions.asNondeterministic()


def cdc_chunks(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Content-defined chunking (Rabin-Karp rolling hash, the
    LBFS/storage-dedup segmentation): a chunk boundary falls wherever
    the window hash h(i) = sum_j c[i-j] * B^j mod M of the trailing
    CDC_K chars satisfies h % CDC_MASK == 0. Boundaries depend only
    on LOCAL content, so an insertion re-chunks just its own
    neighborhood while every downstream chunk survives byte-identical
    — the property fixed-size segmentation lacks, and why chunk-hash
    dedup catches shifted near-duplicates (the d29 complement at
    sub-document granularity). Returns one row per chunk: (id,
    chunk_idx, chunk_md5, chunk_len).

    Integer-exact and SQL-replayable: the hash is the explicit
    B^j-weighted window sum (the closed form of the rolling
    recurrence) over the shared literal power table, mod a prime —
    no float anywhere.

    Scale shape: map-side only — the cut positions come from ONE
    Arrow-batched numpy kernel (the window sum IS np.convolve(codes,
    powers): O(len * CDC_K) vectorized, per-partition, no shuffle),
    and chunk slicing is a small array expression over the returned
    cut list; the only shuffle is the caller's chunk-level aggregate.
    A pure-expression form exists but is the wrong engineering here:
    Spark evaluates higher-order functions interpreted (no codegen)
    and projection collapse re-inlines the giant cuts expression at
    every reference — the unrolled variant spent ~60 s in codegen
    alone, the module's one deliberate native-expression exception.
    Hashing is byte-oriented (CDC is a byte protocol); the oracle's
    ascii() replay coincides on ASCII corpora, which is what the
    fixtures are. Docs shorter than the window are one chunk; a
    boundary at the final char is ignored (no empty tail chunk)."""
    d = (df.select(F.col(id_col), F.col(text_col).alias("_s"))
         .withColumn("_cuts", _cdc_cut_positions("_s")))
    chunks = F.expr(
        "transform(sequence(1, size(_cuts) - 1), "
        "m -> substring(_s, _cuts[m - 1] + 1, "
        "_cuts[m] - _cuts[m - 1]))")
    out = (d.withColumn("_chunks", chunks)
           .select(F.col(id_col),
                   F.posexplode("_chunks").alias("chunk_idx", "_c")))
    return out.select(id_col, "chunk_idx",
                      F.md5("_c").alias("chunk_md5"),
                      F.length("_c").alias("chunk_len"))


def retention_policy(df: DataFrame, clusters: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     cluster_col: str = "component") -> DataFrame:
    """Near-dup RETENTION: given cluster assignments (e.g.
    ``components.connected_components`` over verified LSH pairs),
    pick each cluster's canonical survivor — longest text, smallest
    id on ties (the "keep the most complete copy" rule web-corpus
    dedup applies; length is the usual completeness proxy, the id
    tiebreak makes it a pure function). Docs outside any cluster are
    their own survivors. Returns (id, cluster, keep) for every doc —
    the decision column a curation pipeline filters on.

    Plan: one left join onto the cluster map, one argmax window
    PARTITIONED BY cluster (never global; singleton clusters are
    1-row partitions), no UDF."""
    from pyspark.sql import Window as W

    d = (df.select(F.col(id_col), F.length(text_col).alias("_len"))
         .join(clusters.select(F.col(id_col),
                               F.col(cluster_col).alias("_c")),
               id_col, "left")
         .withColumn("_c", F.coalesce("_c", F.col(id_col))))
    w = W.partitionBy("_c").orderBy(F.col("_len").desc(),
                                    F.col(id_col).asc())
    return (d.withColumn("_rn", F.row_number().over(w))
            .select(id_col, F.col("_c").alias("cluster"),
                    (F.col("_rn") == 1).alias("keep")))


def prefix_filter_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 5,
                        t_num: int = 1, t_den: int = 2) -> DataFrame:
    """EXACT set-similarity self-join via AllPairs prefix filtering
    (Bayardo/Ma/Srikant, WWW 2007; the PPJoin family's base scheme):
    every pair of docs whose word-``n``-gram shingle sets have
    Jaccard >= ``t_num/t_den``, with NO false negatives and NO
    all-pairs comparison. Complements the probabilistic detectors
    (d05 MinHash-LSH misses borderline pairs, d59 caps posting
    lists): this one is lossless at the threshold, so it is the
    ground-truth generator recall evaluations need.

    The filter: order the shingle universe rarest-first (global
    document frequency ASC, shingle ASC — a total order both engines
    replay identically), rank each doc's shingles in that order, and
    index only the PREFIX of length |s| - ceil(t*|s|) + 1. Any pair
    with Jaccard >= t must share at least one prefix shingle
    (pigeonhole on the >= ceil(t*|s|) shared elements), so joining
    prefixes loses nothing; frequent boilerplate shingles sort LAST
    and almost never enter a prefix, which is what keeps posting
    lists short WITHOUT d59's df cap. Candidates then pass the exact
    length prune (t*|big| <= |small|) and exact-intersection verify —
    all integer arithmetic (t_den*inter >= t_num*(n_a+n_b-inter)).

    Scale shape: two shingle-keyed shuffles (df count, prefix
    self-join) + one pair-keyed verify join; the per-doc rank window
    is PARTITIONED BY doc (bounded by doc length, never global).
    Output: (a, b, inter, n_a, n_b, jaccard_ppm), all integers."""
    from pyspark.sql import Window as W

    g = df.select(F.col(id_col).alias("_id"),
                  F.explode(shingle_set(F.col(text_col), n))
                  .alias("_g"))
    sizes = g.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    dfreq = g.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    ranked = (g.join(dfreq, "_g").join(sizes, "_id")
              .withColumn("_r", F.row_number().over(
                  W.partitionBy("_id")
                  .orderBy(F.col("_df").asc(), F.col("_g").asc()))))
    prefix = ranked.filter(
        F.col("_r") <= F.col("_n")
        - F.expr(f"({t_num} * _n + {t_den - 1}) div {t_den}") + 1)
    cand = (prefix.select(F.col("_g"), F.col("_id").alias("_a"))
            .join(prefix.select(F.col("_g"), F.col("_id").alias("_b")),
                  "_g")
            .filter(F.col("_a") < F.col("_b"))
            .select("_a", "_b").distinct()
            .join(sizes.select(F.col("_id").alias("_a"),
                               F.col("_n").alias("n_a")), "_a")
            .join(sizes.select(F.col("_id").alias("_b"),
                               F.col("_n").alias("n_b")), "_b")
            .filter(F.expr(f"{t_den} * least(n_a, n_b) "
                           f">= {t_num} * greatest(n_a, n_b)")))
    # verify join: shingles of a matched against shingles of b
    ga = g.select(F.col("_id").alias("_a"), F.col("_g"))
    gb = g.select(F.col("_id").alias("_b"), F.col("_g"))
    inter = (cand.join(ga, "_a").join(gb, ["_b", "_g"])
             .groupBy("_a", "_b")
             .agg(F.min("n_a").alias("n_a"), F.min("n_b").alias("n_b"),
                  F.count(F.lit(1)).alias("inter"))
             .filter(F.expr(f"{t_den} * inter "
                            f">= {t_num} * (n_a + n_b - inter)")))
    return inter.select(F.col("_a").alias("a"), F.col("_b").alias("b"),
                        "inter", "n_a", "n_b",
                        F.expr("inter * 1000000 div (n_a + n_b - inter)")
                        .alias("jaccard_ppm"))


def sorted_neighborhood_pairs(sim: DataFrame, id_col: str = "doc_id",
                              fp_col: str = "simhash",
                              window: int = 3,
                              block_bits: int = 8) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernandez & Stolfo
    1995) — the third dedup-blocking family next to minhash-LSH
    banding and simhash byte-bands: block records by the
    fingerprint's low ``block_bits`` bits, sort within each block by
    (fingerprint, id), and pair every record with its ``window``
    predecessors. Candidates are O(n * window) by construction —
    the SNM contract — and the sort is per-block (a partitioned
    window keyed on the block, never a global sort; blocks are
    2^block_bits-way parallel at any corpus size). Ties order
    deterministically via the id tiebreak. Returns (block, doc_a,
    doc_b, hamming) — hamming of the two fingerprints, for the
    caller's verify threshold."""
    from pyspark.sql import Window as W

    if window < 1:
        raise ValueError("window must be >= 1")
    blk = F.col(fp_col).bitwiseAND((1 << block_bits) - 1)
    s = sim.select(F.col(id_col).alias("_id"),
                   F.col(fp_col).alias("_fp"), blk.alias("block"))
    w = W.partitionBy("block").orderBy("_fp", "_id")
    for k in range(1, window + 1):
        s = (s.withColumn(f"_i{k}", F.lag("_id", k).over(w))
             .withColumn(f"_f{k}", F.lag("_fp", k).over(w)))
    lags = s.select(
        "block", "_id", "_fp",
        F.explode(F.array(*[
            F.struct(F.col(f"_i{k}").alias("a_id"),
                     F.col(f"_f{k}").alias("a_fp"))
            for k in range(1, window + 1)])).alias("_prev"))
    return (lags.filter(F.col("_prev.a_id").isNotNull())
            .select("block",
                    F.col("_prev.a_id").alias("doc_a"),
                    F.col("_id").alias("doc_b"),
                    F.bit_count(F.col("_prev.a_fp")
                                .bitwiseXOR(F.col("_fp")))
                    .cast("int").alias("hamming")))


def dup_span_stats(df: DataFrame, n: int = 8, max_df: int = 64,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Positional duplicated-span detection — the exact-substring
    dedup signal of Lee et al. 2022 (arXiv:2107.06499, "Deduplicating
    Training Data Makes Language Models Better"), restated over word
    n-grams: a position is DUPLICATED when its n-gram also occurs in
    at least one other document, and a span is a maximal run of
    consecutive duplicated positions. Long runs are verbatim
    cross-document substrings (licenses, boilerplate, mirrored
    articles) that set-similarity dedup (minhash/simhash) dilutes
    away when the rest of the document differs.

    Returns one row per document that has at least one duplicated
    position: (id_col, n_dup_positions, max_run).

    Scale shape: positional n-grams via a native transform over the
    token array (|tokens| rows, no Python); each gram is reduced to
    its 16-hex-char md5 prefix BEFORE the document-frequency shuffle
    so the exchange carries 16-byte keys, not n-gram text; grams with
    df > ``max_df`` (boilerplate headers/footers — the df-cap
    discipline, dropped grams are boilerplate by definition and
    would only inflate every run they touch) and df < 2 are filtered
    at the aggregate, so the join back to positions is bounded;
    run detection is the islands idiom under a per-document window
    (pos - row_number), never a global sort."""
    toks = F.split(F.col(text_col), " ")
    grams = (df.filter(F.size(toks) >= n)
             .select(id_col,
                     F.posexplode(F.expr(
                         f"transform(sequence(0, size(split({text_col}"
                         f", ' ')) - {n}), i -> substring(md5("
                         f"array_join(slice(split({text_col}, ' '), "
                         f"i + 1, {n}), ' ')), 1, 16))"))
                     .alias("pos", "gh")))
    dupg = (grams.groupBy("gh")
            .agg(F.countDistinct(id_col).alias("df"))
            .filter((F.col("df") >= 2) & (F.col("df") <= max_df))
            .select("gh"))
    hits = grams.join(dupg, "gh").select(id_col, "pos")
    from pyspark.sql import Window as W
    w = W.partitionBy(id_col).orderBy("pos")
    runs = hits.withColumn("rid",
                           F.col("pos") - F.row_number().over(w))
    per_run = (runs.groupBy(id_col, "rid")
               .agg(F.count(F.lit(1)).alias("run_len")))
    return (per_run.groupBy(id_col)
            .agg(F.sum("run_len").cast("long")
                 .alias("n_dup_positions"),
                 F.max("run_len").cast("long").alias("max_run")))
