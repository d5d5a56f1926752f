"""Similarity search over embedding columns (array<float>).

  cosine_topk          brute-force exact top-k vs one query vector — the
                       correctness baseline; dot products run JVM-side via
                       higher-order functions (zip_with/aggregate)
  cosine_self_join     exact near-duplicate pairs above a cosine threshold
                       (block-nested join; small/medium corpora)
  lsh_ann_topk         random-hyperplane LSH: signature equi-join shrinks
                       the candidate set, then exact re-rank — the scale
                       path (bucket sizes, not n², bound the work)
  ivf_topk             IVF-style: deterministic centroid sample, assign to
                       nearest centroid, probe nprobe cells

Hyperplanes/centroids are derived deterministically from a seed (hash-based
pseudo-random, no RNG state) so results are reproducible at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine vs a literal query vector. One scan; the sort
    is a TakeOrderedAndProject (never a full global sort)."""
    q = _lit_vec(query_vec)
    return (
        df.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def cosine_self_join(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact pairs with cosine ≥ threshold (id_a < id_b). O(n²/2) compare —
    use lsh_ann_topk buckets first at scale; this is the oracle baseline."""
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _hyperplane(dim: int, plane_idx: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from integer hashing
    (splitmix-style), reproducible across engines and runs."""
    out = []
    for j in range(dim):
        z = (plane_idx * 1_000_003 + j * 97 + seed * 7_919) & 0xFFFFFFFFFFFFFFFF
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        z = (z ^ (z >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        z ^= z >> 31
        out.append((z / 2**64) * 2.0 - 1.0)
    return out


def lsh_signature(vec_col: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """n_planes sign bits packed into a long."""
    bits = []
    for p in range(n_planes):
        h = _lit_vec(_hyperplane(dim, p, seed))
        bits.append(F.when(_dot(vec_col, h) >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def lsh_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN: candidates = vectors sharing a full signature with the query in
    ANY of n_tables hash tables; exact cosine re-rank of candidates only.
    Recall grows with n_tables; candidate count stays ~n/2^n_planes·tables."""
    dim = len(query_vec)
    # ONE scan: a row is a candidate if its signature matches the query's in
    # ANY table (per-table unions would rescan the source n_tables times)
    cond = None
    for t in range(n_tables):
        sig = lsh_signature(F.col(vec_col), dim, n_planes, seed + t * 101)
        # query signature computed driver-side with the same planes
        qsig = 0
        for p in range(n_planes):
            h = _hyperplane(dim, p, seed + t * 101)
            if sum(a * b for a, b in zip(query_vec, h)) >= 0:
                qsig |= 1 << p
        match = sig == F.lit(qsig)
        cond = match if cond is None else cond | match
    cands = df.select(F.col(id_col), F.col(vec_col)).filter(cond)
    q = _lit_vec(query_vec)
    return (
        cands.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def lsh_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate PAIRS at scale: vectors sharing a full
    random-hyperplane signature in any of n_tables tables become candidates
    (equi-join per table on the signature — bucket sizes, not n², bound the
    join), then exact cosine verifies. For cosine ≥ 0.9 the angle is ≤ 26°,
    so P(same 8-bit signature) = (1-26/180)^8 ≈ 0.28 per table →
    1-(1-0.28)^6 ≈ 0.86 recall with 6 tables; raise n_tables for more."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # ONE pass computes every table's signature (per-table self-joins would
    # rescan and re-hash the source n_tables times); candidates come from a
    # single equi-join on (table, signature)
    sigs = base.select(
        "id",
        F.posexplode(
            F.array(*[lsh_signature(F.col("v"), dim, n_planes, seed + t * 101) for t in range(n_tables)])
        ).alias("t", "sig"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t")) & (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assign(df: DataFrame, n_cells: int = 16, id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 42) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """IVF index build: centroids = deterministic hash-sample of the corpus
    (ids with xxhash64(id, seed) smallest — reproducible 'random' sample),
    then one pass assigning every vector to its nearest centroid."""
    sampled = (
        df.select(F.col(id_col), F.col(vec_col))
        .withColumn("__h", F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .orderBy("__h")
        .limit(n_cells)
        .collect()
    )
    centroids = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(sampled)]
    # nearest centroid = argmin over a distance ARRAY (a when-chain that
    # nests the running best would blow up exponentially in expression size)
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(F.col(vec_col), _lit_vec(cv), lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for _, cv in centroids
        ]
    )
    cell = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    assigned = df.withColumn("cell", cell)
    return assigned, centroids


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Probe the nprobe nearest cells to the query, exact re-rank inside.
    At scale the assignment table is precomputed+partitioned by cell, so a
    query touches nprobe/n_cells of the data (partition pruning)."""
    assigned, centroids = ivf_assign(df, n_cells, id_col, vec_col, seed)

    def d2(c):
        return sum((a - b) ** 2 for a, b in zip(query_vec, c))

    probe = sorted(centroids, key=lambda t: d2(t[1]))[:nprobe]
    cells = [ci for ci, _ in probe]
    q = _lit_vec(query_vec)
    return (
        assigned.filter(F.col("cell").isin(cells))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )
