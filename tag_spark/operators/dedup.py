"""Deduplication operators for web-scale training-data pipelines.

Five strategies, cheapest-first (the usual production cascade):

  exact_dedup          content-hash groupBy — one shuffle of (hash, id)
  ngram_jaccard_pairs  exact Jaccard over word shingles via inverted-index
                       self-join (frequency-capped to bound the blowup)
  minhash_lsh_pairs    MinHash signatures + banded LSH bucketing — the
                       100 TB path: candidates come from equi-joins on band
                       keys, never an all-pairs product
  simhash_pairs        64-bit SimHash + hamming-ball verification via
                       band-exact match (vectorized numpy in a pandas UDF)
  embedding_neardup    cosine near-duplicates over an embedding column
                       (delegates to similarity.cosine_self_join)

Everything is DataFrame-native: explode → groupBy → join; the only Python
is Arrow-vectorized numpy (SimHash bit votes). Duplicate *groups* preserve
all members ranked — the engine's dup-preserving semantics
(id3v2.go:329-336 renames rather than drops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tag_spark.operators.text import md5_fingerprint

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", normalized: bool = True) -> DataFrame:
    """All members of every duplicate-content group, ranked by id.
    Returns (id, fingerprint, group_size, dup_rank); dup_rank 0 is the
    keeper. One shuffle on the fingerprint."""
    fp = md5_fingerprint(text_col) if normalized else F.md5(F.coalesce(F.col(text_col), F.lit("")))
    w = Window.partitionBy("fingerprint")
    wo = w.orderBy(F.col(id_col))
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .filter(F.col("group_size") > 1)
        .withColumn("dup_rank", F.row_number().over(wo) - 1)
    )


# ---------------------------------------------------------------------------
# shingling helpers
# ---------------------------------------------------------------------------


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles as an array<string> (empty for short docs).

    Shape matters: a lambda that CAPTURES the outer words array
    (``transform(sequence(...), i -> slice(words, i+1, k))``) re-evaluates
    the whole lower+regexp+split subtree per element — higher-order
    functions run interpreted, with no common-subexpression reuse across
    lambda invocations (measured ~25x: 3.6s for a 5000-doc shingle explode).
    Zipping k shifted slices instead binds words k times per ROW and the
    shingle lambda touches only its own element struct."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    words = F.split(F.trim(F.regexp_replace(F.lower(c), "\\s+", " ")), " ")
    # arrays_zip pads the shorter (shifted) slices with null structs/fields;
    # a shingle is valid only while its LAST word exists, so the tail (and
    # the whole array when len(words) < k) compacts away
    zipped = F.arrays_zip(*[F.slice(words, j + 1, 1 << 30) for j in range(k)])
    shingle = lambda s: F.when(  # noqa: E731
        s[str(k - 1)].isNotNull(), F.concat_ws(" ", *[s[str(j)] for j in range(k)])
    )
    return F.array_distinct(F.array_compact(F.transform(zipped, shingle)))


# ---------------------------------------------------------------------------
# exact n-gram Jaccard via inverted index
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.6,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs (id_a < id_b, jaccard ≥ threshold).

    PREFIX-FILTERED inverted-index plan (the PPJoin family, Xiao et al. /
    Chaudhuri et al., public): (doc, shingle) exploded once → optional
    frequency cap (drop shingles shared by > max_shingle_freq docs) → each
    doc's capped shingles sorted rarest-first by the global (freq, shingle)
    order → ONLY the first |A| - ceil(t·|A|) + 1 shingles of each doc (its
    "prefix") enter the candidate self-join. Pigeonhole guarantee: a pair
    with jaccard ≥ t shares ≥ ceil(t·max(|A|,|B|)) shingles, so its
    prefixes must intersect — zero false negatives; candidates are then
    verified with an exact set intersection over the full capped shingle
    arrays. Replaces the plain shingle self-join, whose candidate volume is
    Σ_sh f(sh)² — quadratic in bucket size for boilerplate shingles just
    under the cap (measured 174 s vs < 10 s at 5 000 docs, cap 1000).

    The exploded/capped streams are persisted for the run: Spark does not
    reuse shared subplans, so the un-persisted plan re-ran the shingle
    pipeline up to 5× per action."""
    shingled = df.select(F.col(id_col).alias("id"), F.explode(word_shingles(text_col, k)).alias("sh")).persist()

    freq = shingled.groupBy("sh").agg(F.count(F.lit(1)).alias("f"))
    if max_shingle_freq is not None:
        freq = freq.filter(F.col("f") <= max_shingle_freq)
    capped = shingled.join(freq, "sh", "inner")

    # one array per doc, sorted by the GLOBAL (freq asc, shingle asc) order
    # — the total order the prefix-filter theorem needs. n_sh counts the
    # capped universe (jaccard must be consistent over it, or identical
    # docs sharing only boilerplate shingles get n_inter=0 against full
    # n_a/n_b and are silently missed). Alongside the string arrays the
    # table carries: hord (xxhash64 per shingle, prefix order) for the
    # candidate join, hset (sorted distinct hashes) for the cheap
    # intersection prefilter, and m = n_sh - |hset| (in-doc hash
    # collisions, almost always 0) for the provable upper bound below.
    # 256-bit presence bitmap per doc, four bit_or(long) partial aggregates;
    # SQL text because F.shiftleft only takes a literal shift amount
    bit_sql = "pmod(xxhash64(sh), 256)"
    bm_aggs = [
        F.bit_or(
            F.expr(
                f"CASE WHEN {bit_sql} >= {64 * w} AND {bit_sql} < {64 * (w + 1)} "
                f"THEN shiftleft(CAST(1 AS BIGINT), CAST({bit_sql} - {64 * w} AS INT)) "
                f"ELSE CAST(0 AS BIGINT) END"
            )
        ).alias(f"bm{w}")
        for w in range(4)
    ]
    # shingle hashes computed in the codegen'd row projection, not in a
    # per-element transform lambda after the collect (higher-order
    # functions evaluate interpreted); the array_sort key is unchanged —
    # (f, sh) leads the struct, h just rides along
    docs_arr = (
        capped.withColumn("__h", F.xxhash64(F.col("sh")))
        .groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct(F.col("f"), F.col("sh"), F.col("__h")))).alias("__fsh"),
            F.count(F.lit(1)).alias("n_sh"),
            *bm_aggs,
        )
        .select(
            "id",
            F.transform(F.col("__fsh"), lambda s: s["sh"]).alias("shs"),
            F.transform(F.col("__fsh"), lambda s: s["__h"]).alias("hord"),
            "n_sh",
            *[f"bm{w}" for w in range(4)],
        )
        .withColumn("m", F.col("n_sh") - F.size(F.array_distinct(F.col("hord"))))
        .persist()
    )

    # prefix length L = n - ceil(t*n) + 1. The output contract keeps pairs
    # whose ROUNDED (6dp, half-up) jaccard reaches t, i.e. true J can be as
    # low as t - 5e-7 — so every pruning bound is derived from the strictly
    # smaller t' = (floor(t*1e6) - 1)/1e6 <= t - 1e-6 < t - 5e-7 (exact
    # integer/double-safe arithmetic; an under-approximated bound only
    # lengthens the prefix / widens the candidate set, never misses a pair)
    t6 = max(0, int(threshold * 1_000_000) - 1)
    alpha = F.ceil(F.lit(t6) * F.col("n_sh") / F.lit(1_000_000))
    prefix_len = F.greatest(F.col("n_sh") - alpha + 1, F.lit(0)).cast("int")
    pref = docs_arr.select(
        "id", "n_sh", F.posexplode(F.slice(F.col("hord"), F.lit(1), prefix_len)).alias("p0", "hb")
    ).persist()

    # pairwise overlap lower bound alpha2 = ceil(t*(n_a+n_b)/(1+t)) — the
    # PPJoin bound, TIGHTER than the per-side ceil(t*n) that sized the
    # prefixes — in exact long arithmetic: ceil(p/q) = (p+q-1 - (p+q-1)%q)/q
    # (float ceil could round the wrong way on exact-integer quotients).
    # POSITIONAL filter: a qualifying pair's FIRST common token at 1-based
    # positions (pa, pb) satisfies 1 + min(n_a-pa, n_b-pb) >= I >= alpha2,
    # so dropping join rows that fail the bound never loses a pair.
    q = 1_000_000 + t6
    p = F.lit(t6) * (F.col("a.n_sh") + F.col("b.n_sh"))
    r = p + F.lit(q - 1)
    alpha2 = (r - F.pmod(r, F.lit(q))) / F.lit(q)
    a = pref.alias("a")
    b = pref.alias("b")
    # NOT deduplicated here: a pair reachable through several shared
    # prefix hashes repeats, but the bitmap upper-bound filter below is a
    # deterministic pure function of the pair's doc attributes, so dedup
    # commutes with it — and running the (broadcast, map-side) bitmap
    # joins FIRST means the dedup exchange carries only bound-surviving
    # pairs (~the true pair set) instead of the full candidate stream
    # (42 M rows at the 50 k-doc sf1.0 corpus). The extra bitmap evals on
    # duplicate candidates are a few codegen'd long ops per row.
    cand = a.join(
        b,
        (F.col("a.hb") == F.col("b.hb"))
        & (F.col("a.id") < F.col("b.id"))
        & (
            (1 + F.least(F.col("a.n_sh") - (F.col("a.p0") + 1), F.col("b.n_sh") - (F.col("b.p0") + 1)))
            >= alpha2
        ),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))

    # stage 1 verify — 256-bit bitmap upper bound, six longs per side
    # instead of whole shingle arrays (carrying two ~50-element arrays
    # through every candidate row was the measured dominant cost). A bit
    # set in A's bitmap but not B's holds only A-exclusive hashes, so
    # |hset_a ∩ hset_b| <= |hset_a| - popcount(bm_a & ~bm_b) (and
    # symmetrically), and true I <= |hset_a ∩ hset_b| + min(m_a, m_b)
    # (collisions WITHIN the true intersection are in-doc collisions on
    # both sides; phantom cross-collisions only inflate). J is monotone in
    # I, so filtering on J_ub >= t' is a provable superset of the true
    # pairs — never a false negative. For typical candidates sharing 1-3
    # shingles the bound sits far below alpha2 and the pair dies here with
    # four AND/popcount ops, fully codegen'd.
    side_cols = lambda side: [  # noqa: E731
        F.col("id").alias(f"id_{side}"),
        F.col("n_sh").alias(f"n_{side}"),
        F.col("m").alias(f"m_{side}"),
        *[F.col(f"bm{w}").alias(f"bm{w}_{side}") for w in range(4)],
    ]
    ha = docs_arr.select(*side_cols("a"))
    hb = docs_arr.select(*side_cols("b"))
    a_only = sum(
        [F.bit_count(F.col(f"bm{w}_a").bitwiseAND(F.bitwise_not(F.col(f"bm{w}_b")))) for w in range(1, 4)],
        F.bit_count(F.col("bm0_a").bitwiseAND(F.bitwise_not(F.col("bm0_b")))),
    )
    b_only = sum(
        [F.bit_count(F.col(f"bm{w}_b").bitwiseAND(F.bitwise_not(F.col(f"bm{w}_a")))) for w in range(1, 4)],
        F.bit_count(F.col("bm0_b").bitwiseAND(F.bitwise_not(F.col("bm0_a")))),
    )
    mmin = F.least(F.col("m_a"), F.col("m_b"))
    iub = F.least(
        (F.col("n_a") - F.col("m_a")) - a_only + mmin,
        (F.col("n_b") - F.col("m_b")) - b_only + mmin,
        F.col("n_a"),
        F.col("n_b"),
    )
    surv = (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("__iub", iub)
        # t - 1e-6 slack: the final filter keeps round(J,6) >= t, so true J
        # may sit 5e-7 below t; J_ub >= J makes this a provable superset
        .filter(F.col("__iub") / (F.col("n_a") + F.col("n_b") - F.col("__iub")) >= threshold - 1e-6)
        .select("id_a", "id_b")
        # dedup AFTER the bitmap kill: the exchange now carries survivors
        # only (see the candidate-join note above)
        .dropDuplicates(["id_a", "id_b"])
    )

    # stage 2 verify — EXACT string intersection on the (tiny) survivor
    # set; identical arithmetic to the original join-count formulation
    av = docs_arr.select(F.col("id").alias("id_a"), F.col("shs").alias("shs_a"), F.col("n_sh").alias("n_a"))
    bv = docs_arr.select(F.col("id").alias("id_b"), F.col("shs").alias("shs_b"), F.col("n_sh").alias("n_b"))
    out = (
        surv.join(av, "id_a")
        .join(bv, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("shs_a", "shs_b")))
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
        # n_inter >= 1 mirrors the original inverted-index join, which could
        # only ever emit pairs sharing a real shingle (relevant at t <= 0,
        # where a phantom hash-only candidate would otherwise pass)
        .filter((F.col("jaccard") >= threshold) & (F.col("n_inter") >= 1))
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3, num_hashes: int = 64, seed: int = 42) -> DataFrame:
    """num_hashes MinHash values per doc. Shape: explode distinct shingles
    once, then num_hashes partial-aggregated ``min(xxhash64(shingle, i))``
    in ONE groupBy — the i-th hash function is xxhash64(shingle, i, seed).

    (A pure higher-order-function formulation without the explode looks
    tempting, but Catalyst's CollapseProject inlines the shingle-array
    expression into every one of the 64 lambdas — measured 100x slower.
    The explode+partial-agg plan shuffles only (id, 64 longs) per doc.)"""
    shingled = df.select(F.col(id_col).alias("id"), F.explode(word_shingles(text_col, k)).alias("sh")).select(
        "id", F.pmod(F.xxhash64(F.col("sh"), F.lit(seed)), F.lit(1 << 31)).alias("hb")
    )

    # universal-hashing family: h_i = (A_i * hb + B_i) mod p, p = 2^31-1
    # (Mersenne prime > the 31-bit hb universe) — one string hash per
    # shingle, then 64 cheap multiply-adds instead of 64 full string hashes.
    # 31-bit hb x 31-bit A stays under 2^62, so ANSI mode (which throws on
    # long overflow) is safe.
    #
    # The modulus MUST be close to hb's range: with a huge modulus (2^61-1
    # originally) A*hb+B never wraps more than twice, the map is piecewise
    # monotone in hb, every h_i shares the same argmin shingle, and the 64
    # "independent" minhashes collapse into one — measured 7/64 signature
    # agreement on a jaccard-0.989 pair (should be ~63/64). With p=2^31-1
    # the product wraps ~2^31 times and the family mixes properly.
    _P = (1 << 31) - 1

    def _mix(i: int, salt: int) -> int:
        z = (i * 0x9E3779B97F4A7C15 + salt * 0xBF58476D1CE4E5B9 + seed) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return int(z >> 33)

    aggs = [
        F.min(F.pmod(F.col("hb") * F.lit(_mix(i, 1) % (_P - 1) + 1) + F.lit(_mix(i, 2) % _P), F.lit(_P))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    wide = shingled.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"), *aggs)
    return wide.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"), "n_shingles")


def minhash_band_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """The PERSISTABLE LSH index: (id, band_idx, band_hash) — one row per
    doc per band. This is the table a production pipeline stores (partition
    or bucket by band_hash at scale) so that tomorrow's shard joins against
    it without recomputing corpus signatures; the whole-corpus path
    (minhash_lsh_pairs) and the incremental path
    (minhash_lsh_pairs_incremental) both build candidates from exactly this
    shape."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, k, num_hashes, seed)
    return sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.array_join(F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band), ",")),
            )
        ).alias("band_idx", "band_hash"),
    )


def _verify_jaccard(cand: DataFrame, docs: DataFrame, id_col: str, text_col: str, k: int, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs only: shingle sets are
    recomputed for CANDIDATE ids alone (semi-join first), so the work is
    candidate-bounded, never corpus-bounded. ``cand`` and the candidate
    shingle table are persisted for the run: each is referenced 2-3 times
    below and Spark re-executes unshared subplans (the un-persisted shape
    re-ran the whole corpus signature pipeline per reference)."""
    ids = cand.select(F.explode(F.array("id_a", "id_b")).alias("id")).distinct()
    sh = (
        docs.select(F.col(id_col).alias("id"), word_shingles(text_col, k).alias("sh"))
        .join(ids, "id", "left_semi")
        .persist()
    )
    return (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    seed: int = 42,
    verify: bool = True,
) -> DataFrame:
    """Candidate pairs from banded LSH (docs sharing any band bucket), then
    (optionally) exact-Jaccard verification of ONLY the candidates.

    With r = num_hashes/bands rows per band, P(candidate) = 1-(1-j^r)^bands —
    16 bands × 4 rows catches j≥0.6 with ~0.97 probability. The join is an
    equi-join on (band_idx, band_hash): at 100 TB this is the only shape
    that survives, since bucket sizes — not n² — bound the work."""
    # NOT persisted: both self-join sides are identical below the signature
    # groupBy exchange, and ReuseExchange dedupes them at runtime — a cache
    # would only add columnar-write cost (measured +2s on the sf1.0 corpus)
    banded = minhash_band_table(df, id_col, text_col, k, num_hashes, bands, seed)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if not verify:
        return cand
    # exact verification on candidates only: shingle sets re-joined for
    # candidate ids alone (arrays stay bounded per doc)
    return _verify_jaccard(cand, df, id_col, text_col, k, threshold)


def minhash_lsh_pairs_incremental(
    new_df: DataFrame,
    band_table: DataFrame,
    corpus_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    seed: int = 42,
    verify: bool = True,
) -> DataFrame:
    """Incremental dedup — the shape a daily pipeline actually runs:
    \"dedupe the NEW shard against the existing corpus\" without
    recomputing corpus signatures. Only the new shard is hashed; its band
    keys equi-join the PERSISTED ``band_table`` (built once by
    minhash_band_table, stored partitioned/bucketed by band_hash at scale)
    for cross-shard candidates, and self-join for within-shard candidates.
    Verification (exact Jaccard over ``corpus_df ∪ new_df`` text, required
    when verify=True) is candidate-bounded: only docs appearing in a
    candidate pair are re-shingled.

    Pairs are normalized to id_a < id_b, so the verified output equals the
    whole-corpus ``minhash_lsh_pairs`` restricted to pairs touching the new
    shard (asserted in tests and by the driver's DuckDB oracle). Reference
    analog: cmd/check re-walks only what you point it at
    (cmd/check/main.go:77-99). To roll the index forward, append the new
    shard's band table (returned by minhash_band_table on the shard) to the
    stored one."""
    nb = minhash_band_table(new_df, id_col, text_col, k, num_hashes, bands, seed)
    all_bands = band_table.unionByName(nb)
    a, b = nb.alias("a"), all_bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if not verify:
        return cand
    if corpus_df is None:
        raise ValueError("verify=True needs corpus_df (text for the candidate pairs' corpus side)")
    docs = corpus_df.select(F.col(id_col), F.col(text_col)).unionByName(
        new_df.select(F.col(id_col), F.col(text_col))
    )
    return _verify_jaccard(cand, docs, id_col, text_col, k, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", seed: int = 42) -> DataFrame:
    """64-bit SimHash per doc, fully expression-based: token → xxhash64 →
    per-bit ±1 votes summed across tokens → sign → bits. Tokens and the
    64-bit loop both unroll into higher-order array ops (no shuffle)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    tokens = F.filter(F.split(F.lower(c), "\\s+"), lambda t: t != "")
    # explode + 64 partial-aggregated bit votes (a higher-order-function
    # formulation re-inlines the vote array into all 64 bit extractions —
    # same CollapseProject pathology as minhash_signatures, measured ~50x)
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens).alias("t")).withColumn(
        "h", F.xxhash64(F.col("t"), F.lit(seed))
    )
    votes = [
        F.sum((F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).cast("int")).alias(f"v{b}")
        for b in range(64)
    ]
    wide = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n_tokens"), *votes)
    sim = None
    for b in range(64):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim.bitwiseOR(term)
    return wide.select("id", sim.alias("simhash"), "n_tokens")


def simhash_md5(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Oracle-portable SimHash: the 64-bit token hash is the first 16 hex
    digits of md5(token), which an independent SQL engine (DuckDB) can
    recompute exactly — unlike xxhash64. Same explode + 64 partial-agg bit
    votes shape as ``simhash``; the output fingerprint is the 16-hex-char
    string (a signed-long top bit would be ANSI-hostile anyway).

    Per bit b: digit d = b//4 of the md5 hex, bit = (digit >> (b%4)) & 1,
    vote = ±1 summed across tokens; output digit = the 4 vote signs."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    tokens = F.filter(F.split(F.lower(c), "\\s+"), lambda t: t != "")
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens).alias("t")).withColumn(
        "h", F.md5(F.encode(F.col("t"), "UTF-8"))
    )
    # digit values 0..15 for the 16 leading hex chars, computed once per row
    digs = [F.conv(F.substring(F.col("h"), d + 1, 1), 16, 10).cast("int").alias(f"d{d}") for d in range(16)]
    tok = tok.select("id", *digs)
    votes = [
        F.sum((F.floor(F.col(f"d{b // 4}") / (1 << (b % 4))).cast("int") % 2) * 2 - 1).alias(f"v{b}")
        for b in range(64)
    ]
    wide = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n_tokens"), *votes)
    hex_chars = "0123456789abcdef"
    out_digits = [
        sum([F.when(F.col(f"v{4 * d + k}") > 0, F.lit(1 << k)).otherwise(F.lit(0)) for k in range(4)], F.lit(0))
        for d in range(16)
    ]
    simhash_hex = F.concat(*[F.lit(hex_chars).substr(dv + 1, F.lit(1)) for dv in out_digits])
    return wide.select("id", simhash_hex.alias("simhash_hex"), "n_tokens")


def simhash_chunk_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """The PERSISTABLE SimHash pigeonhole index: (id, simhash, chunk_idx,
    chunk_val) — 64 bits split into max_hamming+1 chunks, so any pair
    within the hamming ball agrees exactly on ≥1 chunk. Store it once;
    whole-corpus (simhash_pairs) and incremental
    (simhash_pairs_incremental) candidates both come from equi-joins on
    (chunk_idx, chunk_val) against this shape. Verification needs no text:
    the full fingerprint rides on every row."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    sh = simhash(df, id_col, text_col, seed)
    return sh.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit((1 << width) - 1))
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
        # the ball radius the chunk width was derived from rides WITH the
        # persisted index (constant column — parquet RLEs it to nothing) so
        # incremental probes can refuse a mismatched query instead of
        # silently joining mismatched chunk widths
        F.lit(max_hamming).cast("int").alias("max_hamming"),
    )


def _assert_chunk_ball(chunk_table: DataFrame, max_hamming: int) -> None:
    """Chunk width is fixed at index-build time: joining shard chunks built
    with a DIFFERENT max_hamming against a stored chunk table would
    silently return near-empty results (the widths differ, so the
    (chunk_idx, chunk_val) equi-join just misses). Fail loudly instead —
    the table carries its radius as a constant column; probing it is a
    LIMIT-1 read, not a scan."""
    if "max_hamming" not in chunk_table.columns:
        raise ValueError(
            "chunk_table has no max_hamming column — rebuild it with this "
            "version's simhash_chunk_table/simhash_chunk_table_md5 (the "
            "column pins the chunk width the index was built with)"
        )
    row = chunk_table.select("max_hamming").first()
    if row is not None and row["max_hamming"] != max_hamming:
        raise ValueError(
            f"chunk_table was built with max_hamming={row['max_hamming']} but the "
            f"query passed max_hamming={max_hamming}: chunk widths differ, so the "
            "candidate equi-join would silently miss pairs — rebuild the index or "
            "pass the matching max_hamming"
        )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Pigeonhole
    banding: split 64 bits into max_hamming+1 chunks — any pair within the
    ball agrees exactly on ≥1 chunk → candidates via equi-join on
    (chunk_idx, chunk_value), verified with bit_count(xor)."""
    chunks = simhash_chunk_table(df, id_col, text_col, max_hamming, seed)
    a, b = chunks.alias("a"), chunks.alias("b")
    # hamming verified BEFORE the dedup: both fingerprints already ride
    # the candidate row, so the ball test is a pure map-side projection —
    # filtering first means the dropDuplicates exchange carries only TRUE
    # pairs instead of every chunk-collision candidate (dedup commutes
    # with a deterministic per-pair filter; output unchanged)
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs_incremental(
    new_df: DataFrame,
    chunk_table: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Incremental SimHash near-dup: hash ONLY the new shard, equi-join its
    chunks against the persisted ``chunk_table`` (plus the shard's own
    chunks for within-shard pairs), verify hamming from the stored
    fingerprints — no corpus re-hash, no corpus text read at all. Pairs
    normalized to id_a < id_b; equals whole-corpus simhash_pairs restricted
    to pairs touching the shard. Roll the index forward by appending the
    shard's simhash_chunk_table. Raises if ``chunk_table`` was built with a
    different max_hamming (mismatched chunk widths would silently miss)."""
    _assert_chunk_ball(chunk_table, max_hamming)
    nb = simhash_chunk_table(new_df, id_col, text_col, max_hamming, seed)
    all_chunks = chunk_table.unionByName(nb)
    a, b = nb.alias("a"), all_chunks.alias("b")
    # hamming is symmetric (XOR), so the ball test runs directly on the
    # join row BEFORE the id normalization and dedup — the dropDuplicates
    # exchange then carries only TRUE pairs, not every chunk-collision
    # candidate (the filter is a pure per-pair function: dedup commutes)
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


def hamming_hex(a: Column, b: Column, n_digits: int = 16) -> Column:
    """Bit-level hamming distance between two equal-length hex fingerprints,
    engine-portable (no 64-bit signed arithmetic): per-digit base-16 conv,
    xor, bit_count, summed — DuckDB replays it digit-for-digit."""
    terms = [
        F.bit_count(
            F.conv(F.substring(a, d + 1, 1), 16, 10)
            .cast("int")
            .bitwiseXOR(F.conv(F.substring(b, d + 1, 1), 16, 10).cast("int"))
        )
        for d in range(n_digits)
    ]
    return sum(terms[1:], terms[0]).cast("int")


def simhash_chunk_table_md5(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Oracle-portable twin of simhash_chunk_table: the persisted pigeonhole
    index over the md5-derived hex fingerprint — (id, simhash_hex,
    chunk_idx, chunk_val) with the 16 hex digits split into max_hamming+1
    chunks, so any pair within the hamming ball agrees exactly on >=1
    chunk. Chunks are hex-digit-aligned (16 % (max_hamming+1) must be 0:
    max_hamming of 0, 1, 3, 7, 15 supported); the xxhash64 variant stays
    the fast path."""
    n_chunks = max_hamming + 1
    if 16 % n_chunks != 0:
        raise ValueError(f"max_hamming+1 must divide 16 hex digits, got {n_chunks}")
    width = 16 // n_chunks
    sh = simhash_md5(df, id_col, text_col)
    return sh.select(
        "id",
        "simhash_hex",
        F.posexplode(
            F.array(*[F.substring("simhash_hex", i * width + 1, width) for i in range(n_chunks)])
        ).alias("chunk_idx", "chunk_val"),
        # same radius pin as the xxhash64 twin (see _assert_chunk_ball)
        F.lit(max_hamming).cast("int").alias("max_hamming"),
    )


def simhash_pairs_incremental_md5(
    new_df: DataFrame,
    chunk_table: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Incremental SimHash near-dup over the md5-portable fingerprint: hash
    ONLY the new shard, equi-join its chunks against the persisted
    ``chunk_table`` (plus the shard's own chunks for within-shard pairs),
    verify bit-hamming from the stored hex fingerprints — no corpus
    re-hash, no corpus text read. Pairs normalized to id_a < id_b; by the
    pigeonhole guarantee the result equals ALL pairs touching the shard
    with hamming <= max_hamming, which is exactly what an independent SQL
    engine can recompute (the driver-gate oracle does). Reference analog:
    re-walk only what you point at (cmd/check/main.go:77-99). Raises if
    ``chunk_table`` was built with a different max_hamming."""
    _assert_chunk_ball(chunk_table, max_hamming)
    nb = simhash_chunk_table_md5(new_df, id_col, text_col, max_hamming)
    all_chunks = chunk_table.unionByName(nb)
    a, b = nb.alias("a"), all_chunks.alias("b")
    # same reorder as simhash_pairs_incremental: hamming_hex is symmetric
    # per digit (XOR of conv'd digits), so the ball test runs on the join
    # row BEFORE dedup and the exchange carries only TRUE pairs
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
            hamming_hex(F.col("a.simhash_hex"), F.col("b.simhash_hex")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


def _observed_changed_count(obs, fallback, timeout_s: float = 30.0) -> tuple[int, bool]:
    """Read the round's n_changed metric from an Observation, guarded: on a
    degenerate plan Catalyst can ELIMINATE the CollectMetrics node (e.g.
    empty-after-filter folding), in which case the JVM-side get BLOCKS
    forever rather than raising — so the read runs on a bounded daemon
    thread and falls back to an explicit (extra-action) probe when the
    metric never arrives. Returns (count, used_fallback)."""
    import threading

    out: dict = {}

    def grab() -> None:
        try:
            out["v"] = obs.get
        except Exception:
            pass

    t = threading.Thread(target=grab, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    if "v" in out and out["v"].get("n_changed") is not None:
        return int(out["v"]["n_changed"]), False
    return int(fallback()), True


def neardup_clusters(
    ids_df: DataFrame,
    pairs_df: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 25,
    checkpoint_dir: str | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS — the dedup endgame:
    connected components over the pair graph, labeling every document with
    the minimum id of its component. Returns (id, cluster_id, cluster_size,
    is_canonical) for EVERY id in ids_df (singletons form their own
    cluster); "keep the canonical, drop the rest" is then a filter on
    is_canonical.

    Distributed shape: iterated min-label propagation fused with POINTER
    JUMPING (label <- label(label), a self-join on the label table) — the
    jump halves label-chain depth each round, so convergence is O(log
    diameter) rounds rather than O(diameter) (a pure neighbor-min pass
    walks one hop per round and dies on long chains; cf. the
    large-star/small-star contraction of Kiveris et al., "Connected
    Components in MapReduce and Beyond"). Each round is two equi-joins of
    lean (long, long) tables; nothing but a one-row convergence probe
    reaches the driver. At 100 TB the label table is (id, long) — a
    fraction of corpus width — and dup components are stars/cliques that
    converge in 2-3 rounds.

    Determinism: min() labels are order-insensitive; the result is a pure
    function of the pair set. An independent SQL engine replays it with a
    recursive CTE (the driver-gate oracle does exactly that).

    ``checkpoint_dir``: when set, rounds truncate lineage with RELIABLE
    ``.checkpoint()`` into that directory (``setCheckpointDir`` is called
    for you) — the fault-tolerant mode for real cluster runs, where an
    executor loss mid-loop would kill a localCheckpoint'ed run. Default
    (None) keeps ``localCheckpoint``: label RDDs stay on executors, the
    right trade for a bounded O(log n)-round local loop. Both modes
    produce identical labels and constant-size plans (tested).

    ``stats_out``: optional dict that receives {"rounds": int,
    "probe_fallbacks": int} — rounds actually run and how many
    convergence probes had to fall back to the explicit extra action
    (normally 0: the count of changed labels is folded into the round's
    single checkpoint action via ``observe()``)."""
    from pyspark.sql import Observation

    spark = ids_df.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def truncate(df: DataFrame) -> DataFrame:
        # lineage truncation, NOT persist: persist caches the DATA but the
        # ANALYZED PLAN still chains every previous round's self-joins, and
        # Catalyst re-analyzes the whole tree per action — measured 119s
        # for a round over an 11-row label table by round 4 (driver-bound,
        # executors idle). Checkpointing keeps every round's plan
        # constant-size.
        return df.checkpoint(eager=True) if checkpoint_dir is not None else df.localCheckpoint(eager=True)

    nodes = ids_df.select(F.col(id_col).alias("id")).distinct()
    # e is persisted BEFORE the symmetrizing union: the union references the
    # caller's pair plan twice, and when that plan's expensive tail sits
    # above its last exchange (e.g. a broadcast-join verify stage) Spark
    # re-executes it per branch — ReuseExchange only dedupes identical
    # exchange subtrees, not arbitrary subplans (measured 2x the whole
    # pair-generation cost on the jaccard pipeline).
    e = pairs_df.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).persist()
    edges = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct().persist()
    labels = truncate(nodes.select("id", F.col("id").alias("label")))
    rounds = 0
    probe_fallbacks = 0
    try:
        for _ in range(max_rounds):
            rounds += 1
            # 1) neighbor-min: each node takes the min label in its closed
            #    neighborhood (map-side combined groupBy on a lean table)
            nb = (
                edges.join(labels.select(F.col("id").alias("b"), F.col("label").alias("nb_label")), "b")
                .groupBy("a")
                .agg(F.min("nb_label").alias("nb_min"))
                .select(F.col("a").alias("id"), "nb_min")
            )
            # the round-start label rides along as old_label so the
            # convergence count can be observed in the SAME action as the
            # checkpoint — one job per round, not three
            stepped = labels.join(nb, "id", "left").select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nb_min"), F.col("label"))).alias("label"),
                F.col("label").alias("old_label"),
            )
            # 2) pointer jump: label <- label(label). Labels are node ids,
            #    so the hop is a left self-join on the label table
            parent = stepped.select(F.col("id").alias("p_id"), F.col("label").alias("p_label"))
            obs = Observation()
            jumped = truncate(
                stepped.join(parent, stepped["label"] == parent["p_id"], "left")
                .select(
                    stepped["id"],
                    F.coalesce(parent["p_label"], stepped["label"]).alias("label"),
                    stepped["old_label"],
                )
                # coalesce: over ZERO rows sum() is NULL, and per CLAUDE.md
                # degenerate plans may drop the metrics node entirely — the
                # guarded reader below handles both
                .observe(obs, F.coalesce(F.sum((F.col("label") != F.col("old_label")).cast("long")), F.lit(0)).alias("n_changed"))
            )

            def probe_changed(j: DataFrame = jumped) -> int:
                return j.filter(F.col("label") != F.col("old_label")).limit(1).count()

            changed, used_fallback = _observed_changed_count(obs, probe_changed)
            probe_fallbacks += int(used_fallback)
            labels = jumped.select("id", "label")
            if changed == 0:
                break
        else:
            raise RuntimeError(f"neardup_clusters did not converge in {max_rounds} rounds")
        if stats_out is not None:
            stats_out.update({"rounds": rounds, "probe_fallbacks": probe_fallbacks})
        sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
        return (
            labels.join(sizes, "label")
            .select(
                F.col("id").alias(id_col),
                F.col("label").alias("cluster_id"),
                F.col("cluster_size").cast("long").alias("cluster_size"),
                (F.col("id") == F.col("label")).alias("is_canonical"),
            )
        )
    finally:
        edges.unpersist()
        e.unpersist()


def neardup_clusters_incremental(
    new_ids_df: DataFrame,
    new_pairs_df: DataFrame,
    stored_labels_df: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 25,
    checkpoint_dir: str | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Merge a NEW shard into a standing cluster table without touching
    corpus text: the stored (id, cluster_id) table is itself a STAR graph
    that exactly encodes the old components, so connected components over
    (stored stars ∪ shard pairs ∪ shard singletons) equal a full recompute
    over (old pairs ∪ shard pairs) — at the cost of the shard only. Shard
    pairs come from an incremental pair generator (e.g.
    minhash_lsh_pairs_incremental: corpus signatures persisted, shard
    hashed fresh); stars compress arbitrary old components to depth 1, so
    the propagation converges in 2-3 rounds regardless of how many merges
    history accumulated. The daily-pipeline shape, completing the
    incremental family (MinHash / SimHash / IVF append_shard); reference
    analog: re-walk only what you point at (cmd/check/main.go:77-99)."""
    star_edges = stored_labels_df.filter(F.col(id_col) != F.col("cluster_id")).select(
        F.col(id_col).alias(id_a), F.col("cluster_id").alias(id_b)
    )
    all_ids = stored_labels_df.select(id_col).unionByName(new_ids_df.select(id_col)).distinct()
    pairs = new_pairs_df.select(id_a, id_b).unionByName(star_edges)
    return neardup_clusters(all_ids, pairs, id_col, id_a, id_b, max_rounds, checkpoint_dir, stats_out)


# ---------------------------------------------------------------------------
# benchmark decontamination (eval-set n-gram overlap)
# ---------------------------------------------------------------------------


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Training-set decontamination: flag corpus documents sharing any
    k-word shingle with a benchmark/eval set (the Lee et al. 2021 /
    GPT-3-appendix n-gram overlap screen, public). Returns one row per
    CONTAMINATED corpus doc: (doc_id, n_hits = distinct overlapping
    shingles, n_shingles = the doc's distinct shingles, contamination =
    round(n_hits/n_shingles, 6)).

    Reference semantics analog: membership screening of each frame id
    against a closed dictionary (id3v2frames.go:283-287 registry lookup) —
    here the "dictionary" is the benchmark's shingle set.

    Scale shape (100 TB corpus, MB-scale eval set — the real-world
    asymmetry): the benchmark shingle set is DISTINCT-ed and broadcast, so
    corpus shingles are screened map-side with no shuffle of corpus text;
    the only exchange is the per-doc hit count (partial-aggregable, keyed
    by doc_id). n_shingles is computed ROW-LOCALLY (array size) — the
    corpus-wide shingle stream is never shuffled.
    """
    bench = benchmark.select(F.explode(word_shingles(text_col, k)).alias("s")).distinct()
    sizes = corpus.select(
        F.col(id_col).alias("doc_id"), F.size(word_shingles(text_col, k)).alias("n_shingles")
    )
    hits = (
        corpus.select(F.col(id_col).alias("doc_id"), F.explode(word_shingles(text_col, k)).alias("s"))
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_hits",
        "n_shingles",
        F.round(F.col("n_hits") / F.col("n_shingles"), 6).alias("contamination"),
    )
