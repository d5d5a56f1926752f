"""Similarity search: exact top-k baseline, LSH-ANN recall, IVF."""

import pytest

from tag_spark.operators.similarity import cosine_self_join, cosine_topk, ivf_topk, lsh_ann_topk


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]


def test_cosine_topk_exact(emb, qvec):
    top = cosine_topk(emb, qvec, k=5).collect()
    assert top[0]["vec_id"] == 0
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-9
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_ann_recall(emb, qvec):
    exact = [r["vec_id"] for r in cosine_topk(emb, qvec, k=5).collect()]
    ann = [r["vec_id"] for r in lsh_ann_topk(emb, qvec, k=5, n_planes=8, n_tables=8).collect()]
    # the query itself must always be found; recall@5 ≥ 0.4 with 8 tables
    assert exact[0] in ann
    assert len(set(exact) & set(ann)) >= 2


def test_ivf_topk(emb, qvec):
    got = ivf_topk(emb, qvec, k=5, nprobe=8, n_cells=16).collect()
    assert got[0]["vec_id"] == 0  # query's own cell is always probed
    sims = [r["cos_sim"] for r in got]
    assert sims == sorted(sims, reverse=True)


def test_cosine_self_join_threshold(emb):
    pairs = cosine_self_join(emb.limit(60), threshold=0.9).collect()
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert r["cos_sim"] >= 0.9


def test_lsh_neardup_pairs_recall(emb, spark):
    from tag_spark.operators.similarity import lsh_neardup_pairs

    # exact baseline at a modest threshold so some pairs exist on this
    # corpus (max pair cosine ~0.51). At cos=0.35 the angle is ~69.5°, so
    # P(bit agree)=0.614: 4 planes x 16 tables → expected recall
    # 1-(1-0.614^4)^16 ≈ 0.91. Real near-dup thresholds (≥0.9) need far
    # fewer tables — see lsh_neardup_pairs docstring.
    exact = {(r["id_a"], r["id_b"]) for r in cosine_self_join(emb, threshold=0.35).collect()}
    approx_df = lsh_neardup_pairs(emb, dim=64, threshold=0.35, n_planes=4, n_tables=16)
    approx = {(r["id_a"], r["id_b"]) for r in approx_df.collect()}
    # every reported pair is a TRUE pair (verification step is exact)
    assert approx <= exact
    if exact:
        assert len(approx) / len(exact) >= 0.7, (len(approx), len(exact))


def test_lsh_index_query_matches_exact_at_recall_complete_params(emb, qvec):
    """With 2 planes x 16 tables, per-neighbor miss probability is ~1e-3
    even at cos≈0.28, so the index-backed top-k equals exact brute force —
    this is the property the driver oracle relies on."""
    from tag_spark.operators.similarity import LshAnnIndex

    idx = LshAnnIndex(emb, dim=64, n_planes=2, n_tables=16)
    try:
        exact = [(r["vec_id"], r["cos_sim"]) for r in cosine_topk(emb, qvec, k=10).collect()]
        ann = [(r["vec_id"], r["cos_sim"]) for r in idx.topk(qvec, k=10).collect()]
        assert ann == exact
        # repeated queries reuse the same cached signature/vector tables
        q2 = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
        exact2 = [r["vec_id"] for r in cosine_topk(emb, q2, k=5).collect()]
        ann2 = [r["vec_id"] for r in idx.topk(q2, k=5).collect()]
        assert ann2 == exact2
    finally:
        idx.unpersist()


def test_ivf_index_partition_pruning(emb, qvec, tmp_path):
    """A materialized IVF index is partitioned by cell; a probe must be a
    partition-pruned scan (nprobe dirs), not a full read + filter."""
    from tag_spark.operators.similarity import IvfIndex

    idx = IvfIndex(emb, n_cells=8, path=str(tmp_path / "ivf"))
    plan = idx.topk(qvec, k=5, nprobe=2)._jdf.queryExecution().executedPlan().toString()
    # the parquet scan must carry a non-empty partition filter on cell
    assert "PartitionFilters: [cell" in plan or "PartitionFilters: [isnotnull(cell" in plan, plan
    got = idx.topk(qvec, k=5, nprobe=8).collect()  # all cells -> exact
    exact = cosine_topk(emb, qvec, k=5).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]


def test_batched_ann_matches_exact_batch(emb, spark):
    """topk_batch at recall-complete params reproduces the exact batched
    result; IVF with nprobe == n_cells is exhaustive and must match too."""
    from pyspark.sql import functions as F

    from tag_spark.operators.similarity import IvfIndex, LshAnnIndex, cosine_topk_batch

    queries = emb.filter("vec_id % 17 = 1").select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.vec_id) for r in cosine_topk_batch(emb, queries, k=5).collect()}
    idx = LshAnnIndex(emb, dim=64, n_planes=2, n_tables=16)
    try:
        got = {(r.query_id, r.vec_id) for r in idx.topk_batch(queries, k=5).collect()}
        assert got == exact
    finally:
        idx.unpersist()
    ivf = IvfIndex(emb, n_cells=8)
    got_ivf = {(r.query_id, r.vec_id) for r in ivf.topk_batch(queries, k=5, nprobe=8).collect()}
    assert got_ivf == exact


def test_arrow_batch_topk_is_byte_identical_to_expression_path(emb, spark):
    """The r6 Arrow-kernel cosine_topk_batch must reproduce the JVM
    expression path EXACTLY — same rows, same double bits (the kernel's
    per-dimension left fold and NULL semantics are bit-compatible and the
    rounding stays in Catalyst) — including zero-norm (NULL cosine) and
    ragged adversarial vectors."""
    from pyspark.sql import functions as F

    from tag_spark.operators.similarity import _cosine_topk_batch_jvm, cosine_topk_batch

    adv = spark.createDataFrame(
        [(100001, [0.0] * 64), (100002, [1.0] * 63), (100003, None)],
        "vec_id long, embedding array<float>",
    )
    corpus = emb.select("vec_id", "embedding").unionByName(adv)
    queries = corpus.filter("vec_id % 17 = 1 or vec_id > 100000").filter("embedding is not null").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # ragged query set -> the function itself falls back, so force both paths
    got = sorted(
        (r.query_id, r.vec_id, repr(r.cos_sim))
        for r in cosine_topk_batch(corpus, queries.filter("query_id <= 100001"), k=5).collect()
    )
    want = sorted(
        (r.query_id, r.vec_id, repr(r.cos_sim))
        for r in _cosine_topk_batch_jvm(
            corpus, queries.filter("query_id <= 100001"), 5, "vec_id", "embedding", "query_id", "embedding"
        ).collect()
    )
    assert got == want


def test_ann_batch_rerank_is_byte_identical_to_expression_path(emb, spark):
    """The r6 Arrow-kernel re-rank inside LshAnnIndex.topk_batch and
    IvfIndex.topk_batch must reproduce their JVM expression fallbacks
    EXACTLY — same rows, same double bits (strict per-dimension fold,
    rounding in Catalyst) — including zero-norm (NULL cosine), ragged and
    NULL corpus vectors, and queries with < k candidates."""
    from pyspark.sql import functions as F

    from tag_spark.operators.similarity import IvfIndex, LshAnnIndex

    adv = spark.createDataFrame(
        [(100001, [0.0] * 64), (100002, [1.0] * 63), (100003, None)],
        "vec_id long, embedding array<float>",
    )
    corpus = emb.select("vec_id", "embedding").unionByName(adv)
    queries = emb.filter("vec_id % 13 = 1").select(F.col("vec_id").alias("query_id"), "embedding")

    def canon(rows):
        return sorted((r.query_id, r.vec_id, repr(r.cos_sim)) for r in rows)

    # few tables so some queries see < k candidates (the NULL-cap branch)
    idx = LshAnnIndex(corpus, dim=64, n_planes=8, n_tables=2)
    try:
        assert canon(idx.topk_batch(queries, k=5).collect()) == canon(
            idx._topk_batch_jvm(queries, 5, "query_id", "embedding").collect()
        )
    finally:
        idx.unpersist()

    # IVF: adversarial vectors restricted to what assignment accepts
    # (zero vector); NULL/ragged corpus rows are exercised by the LSH arm
    ivf_corpus = emb.select("vec_id", "embedding").unionByName(adv.filter("vec_id = 100001"))
    ivf = IvfIndex(ivf_corpus, n_cells=8)
    assert canon(ivf.topk_batch(queries, k=5, nprobe=3).collect()) == canon(
        ivf._topk_batch_jvm(queries, 5, 3, "query_id", "embedding").collect()
    )

    # non-integral query ids take the JVM fallback and still compute
    squeries = queries.select(F.col("query_id").cast("string").alias("query_id"), "embedding")
    idx2 = LshAnnIndex(emb, dim=64, n_planes=8, n_tables=2)
    try:
        rows = idx2.topk_batch(squeries, k=3).collect()
        assert rows and all(isinstance(r.query_id, str) for r in rows)
    finally:
        idx2.unpersist()


def test_ivf_index_rebuilds_on_stale_path(emb, qvec, tmp_path):
    """A path built from DIFFERENT data must be rebuilt, not silently
    reused with fresh centroids (probes would hit the wrong cells)."""
    from tag_spark.operators.similarity import IvfIndex

    p = str(tmp_path / "ivf")
    IvfIndex(emb.filter("vec_id < 20"), n_cells=4, path=p)  # stale corpus
    idx = IvfIndex(emb, n_cells=4, path=p)  # full corpus -> must rebuild
    got = idx.topk(qvec, k=5, nprobe=4).collect()  # nprobe=all -> exact
    exact = cosine_topk(emb, qvec, k=5).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]
    # and an up-to-date path is NOT rewritten (mtime unchanged)
    import os

    m1 = os.path.getmtime(f"{p}/_ivf_centroids.json")
    IvfIndex(emb, n_cells=4, path=p)
    assert os.path.getmtime(f"{p}/_ivf_centroids.json") == m1


def test_ivf_kmeans_exhaustive_probe_matches_exact(emb, qvec):
    """kmeans-refined cells repartition the corpus but never lose vectors:
    probing every cell is still exhaustive => equals brute force."""
    from tag_spark.operators.similarity import IvfIndex

    idx = IvfIndex(emb, n_cells=8, kmeans_iters=2)
    got = idx.topk(qvec, k=5, nprobe=8).collect()
    exact = cosine_topk(emb, qvec, k=5).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in got] == [(r["vec_id"], r["cos_sim"]) for r in exact]
    # batch path probes through the same broadcast-matrix argsort
    from pyspark.sql import functions as F

    queries = emb.filter("vec_id % 29 = 1").select(F.col("vec_id").alias("query_id"), "embedding")
    from tag_spark.operators.similarity import cosine_topk_batch

    exact_b = {(r.query_id, r.vec_id) for r in cosine_topk_batch(emb, queries, k=5).collect()}
    got_b = {(r.query_id, r.vec_id) for r in idx.topk_batch(queries, k=5, nprobe=8).collect()}
    assert got_b == exact_b


def test_ivf_assignment_plan_is_broadcast_argmin_not_literal_expressions(emb):
    """The 100 TB gate: assignment must be ONE Arrow-batched argmin against
    a broadcast matrix — the plan may not contain per-centroid literal
    array expressions (the round-2 shape whose size grew O(n_cells))."""
    from tag_spark.operators.similarity import _sample_centroids, assign_cells

    cent = _sample_centroids(emb, 16, "vec_id", "embedding")
    plan = assign_cells(emb, cent)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan  # Arrow-vectorized, NOT BatchEvalPython row-at-a-time
    assert "BatchEvalPython" not in plan, plan
    for marker in ("array_min", "array_position", "aggregate(", "CaseWhen"):
        assert marker not in plan, (marker, plan)


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    """A centroid that attracts no members must carry over unchanged (the
    oracle's LEFT JOIN + coalesce rule), and member cells move to the
    6dp-rounded mean of their members."""
    import numpy as np

    from tag_spark.operators.similarity import kmeans_refine

    rows = [(i, [10.0, 10.0] if i % 2 == 0 else [10.0, 10.4]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    # cell 0 sits between the two point clouds and wins every vector
    # (ties impossible); cell 1 is far away and must stay put
    init = np.array([[10.0, 10.2], [-50.0, -50.0]])
    out = kmeans_refine(df, init, iters=1)
    assert out[1].tolist() == [-50.0, -50.0]
    assert out[0].tolist() == [10.0, 10.2]  # mean of members, rounded 6dp


def test_ivf_meta_io_via_hadoop_fs(emb, tmp_path, spark):
    """Index metadata goes through the Hadoop FS API; refined centroids are
    persisted and a rebuild over unchanged data reuses them without
    re-running the Lloyd passes (fingerprint match short-circuit)."""
    from tag_spark.operators.similarity import IvfIndex, _fs_read_text

    p = str(tmp_path / "ivf_k")
    idx1 = IvfIndex(emb, n_cells=4, kmeans_iters=1, path=p)
    import json

    meta = json.loads(_fs_read_text(spark, f"{p}/_ivf_centroids.json"))
    assert meta["kmeans_iters"] == 1 and len(meta["centroids"]) == 4
    idx2 = IvfIndex(emb, n_cells=4, kmeans_iters=1, path=p)
    assert (idx2.centroids == idx1.centroids).all()


def test_ivf_append_shard_incremental(emb, qvec, tmp_path, spark):
    """append_shard assigns ONLY the new rows against frozen centroids,
    appends to the cell-partitioned parquet, and advances the ADDITIVE
    fingerprint — reopening over the full appended corpus reuses the
    frozen centroids instead of rebuilding."""
    import os

    from tag_spark.operators.similarity import IvfIndex

    corpus = emb.filter("vec_id % 5 != 0")
    new = emb.filter("vec_id % 5 = 0")  # includes vec_id 0 == the query itself
    p = str(tmp_path / "ivf_incr")
    idx = IvfIndex(corpus, n_cells=4, kmeans_iters=1, path=p)
    idx.append_shard(new)
    # probes now see the appended vectors: exhaustive probe == exact(union)
    got = idx.topk(qvec, k=5, nprobe=4).collect()
    exact = cosine_topk(emb, qvec, k=5).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]
    # reopen over the FULL corpus: additive fingerprint matches, so the
    # frozen centroids are reused and the meta file is not rewritten
    m1 = os.path.getmtime(f"{p}/_ivf_centroids.json")
    idx2 = IvfIndex(emb, n_cells=4, kmeans_iters=1, path=p)
    assert (idx2.centroids == idx.centroids).all()
    assert os.path.getmtime(f"{p}/_ivf_centroids.json") == m1
    # read-only shard assignment requires no path and rescans nothing
    mem_idx = IvfIndex(corpus, n_cells=4, kmeans_iters=1)
    a = mem_idx.assign_shard(new)
    assert a.count() == new.count() and "cell" in a.columns


def test_scan_row_count_uses_footers_for_pure_scans(spark, emb):
    """Pure parquet scans size from file footers (no count job); filtered
    or transformed inputs fall back to an exact count()."""
    from tag_spark.operators.similarity import _scan_row_count

    raw = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert _scan_row_count(raw) == raw.count()
    filtered = raw.filter("vec_id % 2 = 0")
    assert _scan_row_count(filtered) == filtered.count()  # must NOT overcount from footers


def test_scan_row_count_limit_sample_fall_back(spark, emb):
    """Row-count-changing nodes WITHOUT a Filter (Limit, Sample) must fall
    back to count() — the whitelist catches what a Filter blacklist missed."""
    from tag_spark.operators.similarity import _scan_row_count

    raw = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert _scan_row_count(raw.limit(5)) == 5
    sampled = raw.sample(0.5, seed=1)
    assert _scan_row_count(sampled) == sampled.count()


def test_scan_row_count_distributed_footer_job(spark, tmp_path, monkeypatch):
    """Above _DRIVER_FOOTER_LIMIT files the footer reads run as ONE Spark
    job over the path list — never a sequential driver loop at 10^5 files."""
    import tag_spark.operators.similarity as sim

    p = str(tmp_path / "many_files")
    spark.range(100).repartition(10).write.parquet(p)
    df = spark.read.parquet(p)
    monkeypatch.setattr(sim, "_DRIVER_FOOTER_LIMIT", 2)
    calls = {"n": 0}
    orig = sim._distributed_footer_count

    def spy(s, paths):
        calls["n"] += 1
        return orig(s, paths)

    monkeypatch.setattr(sim, "_distributed_footer_count", spy)
    assert sim._scan_row_count(df) == 100
    assert calls["n"] == 1


def test_assign_and_probe_share_one_distance_formula(spark, emb):
    """assign_cells (Arrow UDF) and probe_cells (driver numpy) must agree on
    the nearest cell for EVERY vector — both now compute the direct-form
    sum((x-c)^2) through the shared _direct_d2 helper, so a near-tie can
    never flip between the paths (the expanded |x|^2-2xc+|c|^2 form loses
    bits to cancellation when a vector sits near a centroid)."""
    import numpy as np

    from tag_spark.operators.similarity import IvfIndex, _sample_centroids, assign_cells

    idx = IvfIndex(emb, n_cells=8)
    rows = assign_cells(emb, idx.centroids).select("vec_id", "embedding", "cell").collect()
    for r in rows[:100]:
        assert idx.probe_cells([float(x) for x in r["embedding"]], 1)[0] == r["cell"]
    # exact-tie determinism: a vector equidistant from two centroids goes to
    # the LOWEST cell on both paths
    C = np.zeros((2, 4))
    C[0, 0], C[1, 0] = -1.0, 1.0
    tie_df = spark.createDataFrame([(0, [0.0, 0.0, 0.0, 0.0])], "vec_id: long, embedding: array<float>")
    assert assign_cells(tie_df, C).first()["cell"] == 0


def test_kmeans_refine_high_dim_partial_sum(spark):
    """Lloyd rounds at production embedding dims: dim 512 runs through ONE
    Arrow partial-sum pass (plan size independent of dim — the per-
    coordinate avg(element_at) shape would be 512 aggregate expressions),
    and the means match a driver-side numpy replay with the same HALF_UP
    6dp rounding."""
    import numpy as np

    from tag_spark.operators.similarity import _round6_half_up, kmeans_refine

    dim, n = 512, 60
    rng = [[float(((i * 131 + j * 17) % 97) / 97.0 - 0.5) for j in range(dim)] for i in range(n)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rng)], "vec_id: long, embedding: array<float>")
    init = np.array([rng[0], rng[1], rng[2]], dtype=np.float64)
    got = kmeans_refine(df, init, iters=1)

    X = np.array([np.array(v, dtype=np.float32).astype(np.float64) for v in rng])
    d2 = ((X[:, None, :] - init[None, :, :]) ** 2).sum(axis=2)
    cells = np.argmin(d2, axis=1)
    expect = init.copy()
    for c in range(3):
        members = X[cells == c]
        if len(members):
            expect[c] = [_round6_half_up(v) for v in members.mean(axis=0)]
    assert np.allclose(got, expect, atol=1e-9)


def test_ivf_corrupt_meta_rebuilds(emb, qvec, tmp_path, spark):
    """Truncated _ivf_centroids.json (crash mid-write) = stale index ->
    rebuild; never a permanently wedged path raising JSONDecodeError."""
    from tag_spark.operators.similarity import IvfIndex

    p = str(tmp_path / "ivf_corrupt")
    idx = IvfIndex(emb, n_cells=8, path=p)
    want = [r["vec_id"] for r in idx.topk(qvec, k=5, nprobe=8).collect()]
    with open(f"{p}/_ivf_centroids.json", "w") as f:
        f.write('{"fingerprint": "abc, TRUNC')  # torn write
    idx2 = IvfIndex(emb, n_cells=8, path=p)
    got = [r["vec_id"] for r in idx2.topk(qvec, k=5, nprobe=8).collect()]
    assert got == want


def test_lsh_build_kernel_sigs_match_expression_path(spark):
    """The r6 Arrow-kernel index signatures (_signed) must equal the
    expression shape (_sigs_expr_df) BIT FOR BIT, including the edges
    where SQL and numpy semantics diverge: NULL vector / ragged length /
    NULL element (NULL dot -> bit unset), NaN element (SQL NaN >= 0 is
    TRUE -> bit set), zero vector, ±inf. The kernel replaced a plan
    carrying n_tables × n_planes hyperplane literal arrays through
    interpreted HOFs (measured ~4 s per build at 2k vectors)."""
    from pyspark.sql import types as T

    from tag_spark.operators.similarity import LshAnnIndex

    assert spark.sql("SELECT double('NaN') >= 0 AS x").first()["x"] is True
    rows = [
        (1, [0.5] * 64),
        (2, [-0.5] * 64),
        (3, None),
        (4, [0.1] * 63),
        (5, [0.1] * 65),
        (6, [0.1] * 32 + [None] + [0.1] * 31),
        (7, [float("nan")] + [0.2] * 63),
        (8, [0.0] * 64),
        (9, [1e30] * 64),
        (10, [float("-inf")] + [1.0] * 63),
    ]
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("embedding", T.ArrayType(T.FloatType()))]
    )
    df = spark.createDataFrame(rows, schema)
    idx = LshAnnIndex(df, dim=64, n_planes=8, n_tables=8)
    try:
        kern = {r["id"]: r["sigs"] for r in idx._signed(df, "vec_id", "embedding").collect()}
        expr = {r["id"]: r["sigs"] for r in idx._sigs_expr_df(df, "vec_id", "embedding").collect()}
        assert kern == expr
    finally:
        idx.unpersist()
