"""Dedup cascade: exact, n-gram Jaccard, MinHash-LSH, SimHash."""

import pytest
from pyspark.sql import functions as F

from tag_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from the tall fence "
    "and the birds sing in the morning light near the old stone bridge by the river"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("morning", "evening")),  # near dup of 0
        (3, BASE.replace("quick brown", "slow red").replace("lazy", "sleepy")),  # near-ish
        (4, "completely different content about spark dataframes and shuffle partitions at scale"),
        (5, "another unrelated document mentioning minhash signatures and banded lsh buckets"),
        (6, "  The   Quick Brown fox jumps over the lazy dog while the cat watches from the tall fence "
            "and the birds sing in the morning light near the old stone bridge by the river"),  # case/ws variant of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalized(docs):
    d = exact_dedup(docs)
    groups = {tuple(sorted(r["doc_id"] for r in g)) for g in [d.collect()] for g in [d.collect()]}
    rows = d.collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == [0, 1, 6]  # 6 differs only in case/whitespace
    assert {r["dup_rank"] for r in rows} == {0, 1, 2}
    assert all(r["group_size"] == 3 for r in rows)


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = df.select(word_shingles("text", 3).alias("s")).collect()
    assert got[0]["s"] == ["a b c", "b c d"]
    assert got[1]["s"] == []


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 6) in pairs and pairs[(0, 6)] == 1.0  # normalization via lower/ws-collapse
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert not any({a, b} & {4, 5} for a, b in pairs)


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs
    assert (0, 2) in pairs
    assert not any({a, b} & {4, 5} for a, b in pairs)
    # verified candidates must match exact jaccard values
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    for key, j in pairs.items():
        assert key in exact
        assert abs(exact[key] - j) < 1e-9


def test_simhash_identical_and_near(docs):
    sh = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[0] == sh[1]  # identical text → identical simhash
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=6).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 2) in pairs  # near dup within hamming ball
    assert (4, 5) not in pairs


def test_lsh_deterministic(docs):
    a = sorted(map(tuple, minhash_lsh_pairs(docs, threshold=0.5).collect()))
    b = sorted(map(tuple, minhash_lsh_pairs(docs.repartition(7), threshold=0.5).collect()))
    assert a == b


def test_minhash_signature_agreement_tracks_jaccard(spark):
    """P(minhash_i(A) == minhash_i(B)) must be ~jaccard(A, B) — the defining
    MinHash property. Regression: a too-large universal-hash modulus made the
    64 hash functions share one argmin shingle (7/64 agreement on a
    jaccard-0.989 pair instead of ~63/64), silently breaking LSH recall."""
    from tag_spark.operators.dedup import minhash_signatures

    base = " ".join(f"w{i}" for i in range(200))
    variant = " ".join(f"w{i}" for i in range(199)) + " zz"  # ~0.99 shingle jaccard
    df = spark.createDataFrame([(1, base), (2, variant)], "doc_id long, text string")
    sigs = {r.id: r.sig for r in minhash_signatures(df, num_hashes=64).collect()}
    agree = sum(1 for a, b in zip(sigs[1], sigs[2]) if a == b)
    assert agree >= 55, f"signature agreement {agree}/64 far below jaccard ~0.98"


def test_jaccard_shingle_frequency_cap_drops_boilerplate(spark):
    """A shingle shared by every doc (boilerplate header) is quadratic in
    candidates; the cap drops it while jaccard stays consistent over the
    capped shingle universe."""
    boiler = "copyright acme corp all rights reserved"
    rows = [(i, boiler + " " + " ".join(f"doc{i}w{j}" for j in range(20))) for i in range(30)]
    rows.append((100, boiler + " " + " ".join(f"doc99w{j}" for j in range(20))))
    rows.append((101, boiler + " " + " ".join(f"doc99w{j}" for j in range(20)) + " tail"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(df, threshold=0.5, max_shingle_freq=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    # only the genuinely-similar pair survives; boilerplate-only overlap doesn't
    assert got == {(100, 101)}


def test_simhash_md5_variant_tracks_similarity(spark):
    """The oracle-portable md5 SimHash must behave like a simhash: identical
    docs get identical fingerprints, near-identical docs differ in few hex
    digits, unrelated docs differ in many."""
    from tag_spark.operators.dedup import simhash_md5

    df = spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, BASE + " extra token here"), (4, "completely different words entirely unrelated content")],
        "doc_id long, text string",
    )
    fp = {r.id: r.simhash_hex for r in simhash_md5(df).collect()}
    assert all(len(v) == 16 for v in fp.values())
    assert fp[1] == fp[2]
    diff = lambda a, b: sum(1 for x, y in zip(a, b) if x != y)  # noqa: E731
    assert diff(fp[1], fp[3]) <= 6
    assert diff(fp[1], fp[4]) > diff(fp[1], fp[3])


def test_minhash_incremental_equals_full(docs, spark):
    """Append a shard with cross-shard and within-shard duplicates: the
    incremental path (persisted band table, only the shard re-hashed) must
    find exactly the full-corpus pairs that touch the shard."""
    from tag_spark.operators.dedup import minhash_band_table, minhash_lsh_pairs_incremental

    shard = spark.createDataFrame(
        [
            (100, BASE),  # cross-shard exact dup of 0/1/6
            (101, BASE.replace("birds", "crows")),  # cross-shard near dup
            (102, "a totally novel shard document about iceberg snapshots and manifests"),
            (103, "a totally novel shard document about iceberg snapshots and manifests "),  # within-shard dup of 102
        ],
        "doc_id long, text string",
    )
    kwargs = dict(k=3, num_hashes=64, bands=32, threshold=0.3)
    index = minhash_band_table(docs, bands=32)  # built once from the corpus
    inc = minhash_lsh_pairs_incremental(shard, index, corpus_df=docs, **kwargs)
    full = minhash_lsh_pairs(docs.unionByName(shard), **kwargs)
    shard_ids = {100, 101, 102, 103}
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in full.collect()
        if r["id_a"] in shard_ids or r["id_b"] in shard_ids
    }
    got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in inc.collect()}
    assert got == want
    assert any(a < 100 and b >= 100 for a, b, _ in got)  # cross-shard pairs found
    assert (102, 103) in {(a, b) for a, b, _ in got}  # within-shard pair found
    assert not any(a < 100 and b < 100 for a, b, _ in got)  # corpus-only pairs untouched


def test_simhash_incremental_equals_full(docs, spark):
    from tag_spark.operators.dedup import simhash_chunk_table, simhash_pairs_incremental

    shard = spark.createDataFrame(
        [(200, BASE), (201, BASE.replace("morning", "evening")), (202, "novel text entirely")],
        "doc_id long, text string",
    )
    index = simhash_chunk_table(docs, max_hamming=6)
    inc = simhash_pairs_incremental(shard, index, max_hamming=6)
    full = simhash_pairs(docs.unionByName(shard), max_hamming=6)
    shard_ids = {200, 201, 202}
    want = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in full.collect()
        if r["id_a"] in shard_ids or r["id_b"] in shard_ids
    }
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in inc.collect()}
    assert got == want
    assert any(a < 200 for a, b, _ in got)  # found pairs against the stored corpus


def test_hamming_hex_matches_python(spark):
    from tag_spark.operators.dedup import hamming_hex

    cases = [
        ("0000000000000000", "0000000000000000"),
        ("ffffffffffffffff", "0000000000000000"),
        ("deadbeefdeadbeef", "deadbeefdeadbeee"),
        ("0123456789abcdef", "fedcba9876543210"),
    ]
    df = spark.createDataFrame(cases, "a string, b string")
    got = {(r["a"], r["b"]): r["h"] for r in df.select("a", "b", hamming_hex(F.col("a"), F.col("b")).alias("h")).collect()}
    for a, b in cases:
        assert got[(a, b)] == bin(int(a, 16) ^ int(b, 16)).count("1")


def test_simhash_incremental_md5_equals_full(docs, spark):
    """The oracle-portable incremental path: pigeonhole over the md5 hex
    fingerprint; result == all pairs touching the shard within the hamming
    ball (recall-exact by the pigeonhole argument, verified here against a
    brute-force replay of the stored fingerprints)."""
    from tag_spark.operators.dedup import hamming_hex, simhash_chunk_table_md5, simhash_md5, simhash_pairs_incremental_md5

    shard = spark.createDataFrame(
        [(200, BASE), (201, BASE.replace("morning", "evening")), (202, "novel text entirely")],
        "doc_id long, text string",
    )
    index = simhash_chunk_table_md5(docs, max_hamming=3)
    inc = simhash_pairs_incremental_md5(shard, index, max_hamming=3)
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in inc.collect()}

    # brute-force ground truth from the fingerprints themselves
    sims = {r["id"]: r["simhash_hex"] for r in simhash_md5(docs.unionByName(shard)).collect()}
    shard_ids = {200, 201, 202}
    want = set()
    for a in sorted(sims):
        for b in sorted(sims):
            if a < b and (a in shard_ids or b in shard_ids):
                h = bin(int(sims[a], 16) ^ int(sims[b], 16)).count("1")
                if h <= 3:
                    want.add((a, b, h))
    assert got == want
    assert any(a < 200 for a, b, _ in got)  # found pairs against the stored corpus


def test_simhash_chunk_table_md5_rejects_unaligned_ball(docs):
    from tag_spark.operators.dedup import simhash_chunk_table_md5

    with pytest.raises(ValueError):
        simhash_chunk_table_md5(docs, max_hamming=4)  # 5 chunks don't divide 16 hex digits


def test_neardup_clusters_topologies(spark):
    """Connected components over crafted graphs: a 6-chain (worst case for
    pure neighbor-min — needs pointer jumping), a clique, a pair, and
    singletons; every node labeled with its component min."""
    from tag_spark.operators.dedup import neardup_clusters

    ids = spark.createDataFrame([(i,) for i in range(14)], "doc_id long")
    pairs = spark.createDataFrame(
        # chain 0-1-2-3-4-5, clique {6,7,8}, pair {9,10}; 11-13 singletons
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (7, 8), (6, 8), (9, 10)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"]) for r in neardup_clusters(ids, pairs).collect()}
    assert len(got) == 14
    for i in range(6):
        assert got[i] == (0, 6, i == 0)
    for i in (6, 7, 8):
        assert got[i] == (6, 3, i == 6)
    for i in (9, 10):
        assert got[i] == (9, 2, i == 9)
    for i in (11, 12, 13):
        assert got[i] == (i, 1, True)


def test_neardup_clusters_empty_pairs(spark):
    from tag_spark.operators.dedup import neardup_clusters

    ids = spark.createDataFrame([(1,), (2,)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(ids, pairs).collect()}
    assert got == {1: 1, 2: 2}


def test_neardup_clusters_incremental_equals_full(spark):
    """Star-compressed incremental merge == full recompute: stored corpus
    clusters + shard-touching pairs give the same components as clustering
    everything from scratch."""
    from tag_spark.operators.dedup import neardup_clusters, neardup_clusters_incremental

    corpus_ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    corpus_pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    stored = neardup_clusters(corpus_ids, corpus_pairs)
    shard_ids = spark.createDataFrame([(100,), (101,), (102,)], "doc_id long")
    # shard pairs touch the corpus (101-2 merges into {0,1,2}; 100-101 joins
    # the shard; 102 is a singleton) and bridge two old clusters (5-100-...)
    shard_pairs = spark.createDataFrame([(2, 101), (100, 101), (5, 100)], "id_a long, id_b long")
    inc = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in neardup_clusters_incremental(shard_ids, shard_pairs, stored).collect()
    }
    full = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in neardup_clusters(
            corpus_ids.unionByName(shard_ids), corpus_pairs.unionByName(shard_pairs)
        ).collect()
    }
    assert inc == full
    assert inc[101] == (0, 7, False)  # {0,1,2,101,100,4,5} merged through the bridge
    assert inc[102] == (102, 1, True)


def test_neardup_clusters_plan_size_is_round_independent(spark):
    """Regression pin for the iterative-join pathology: persist caches data
    but the ANALYZED plan still chains every round's self-joins, and
    Catalyst re-analysis grew to ~2 minutes per round on an 11-row label
    table. localCheckpoint truncates lineage, so the returned plan must be
    a bounded join over a checkpointed RDD scan — NOT a tower of per-round
    joins — no matter how many rounds ran."""
    from tag_spark.operators.dedup import neardup_clusters

    n = 24  # a 24-node path forces several propagation rounds
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    res = neardup_clusters(ids, pairs)
    plan = res._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 3, plan
    assert "ExistingRDD" in plan or "LogicalRDD" in plan or "Scan" in plan
    got = {r["doc_id"]: r["cluster_id"] for r in res.collect()}
    assert got == {i: 0 for i in range(n)}


def test_neardup_clusters_one_action_per_round(spark):
    """The convergence probe is FOLDED into each round's single checkpoint
    action via observe(): probe_fallbacks must be 0 (the changed-label
    count came from the observed metric, no extra job), and with AQE off
    the job count is bounded by 3/round (the checkpoint action plus the
    two joins' broadcast builds) — the old explicit probe added its own
    action + broadcasts every round."""
    from tag_spark.operators.dedup import neardup_clusters

    sc = spark.sparkContext
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        n = 24
        ids = spark.range(n).select(F.col("id").alias("doc_id"))
        pairs = spark.range(n - 1).select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        stats: dict = {}
        sc.setJobGroup("cc-action-count", "neardup_clusters job-count pin")
        res = neardup_clusters(ids, pairs, stats_out=stats)
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup("cc-action-count")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert stats["probe_fallbacks"] == 0, stats
    assert stats["rounds"] >= 3  # a 24-path needs several propagation rounds
    assert len(jobs) <= 3 * stats["rounds"] + 2, (len(jobs), stats)
    row = res.agg(F.min("cluster_id"), F.max("cluster_id"), F.count(F.lit(1))).first()
    assert tuple(row) == (0, 0, 24)


def test_neardup_clusters_reliable_checkpoint_mode(spark, tmp_path):
    """checkpoint_dir mode (fault-tolerant .checkpoint()) must produce
    labels identical to the localCheckpoint default AND keep the returned
    plan constant-size."""
    from tag_spark.operators.dedup import neardup_clusters

    ids = spark.createDataFrame([(i,) for i in range(14)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (7, 8), (6, 8), (9, 10)],
        "id_a long, id_b long",
    )
    local = {(r["doc_id"], r["cluster_id"], r["cluster_size"], r["is_canonical"]) for r in neardup_clusters(ids, pairs).collect()}
    rel_df = neardup_clusters(ids, pairs, checkpoint_dir=str(tmp_path / "cc_ckpt"))
    reliable = {(r["doc_id"], r["cluster_id"], r["cluster_size"], r["is_canonical"]) for r in rel_df.collect()}
    assert local == reliable
    plan = rel_df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 3, plan


def test_neardup_clusters_path_graph_stress(spark):
    """10^4-node PATH — worst-case diameter, the shape a chained
    boilerplate-dup corpus produces. Pointer jumping must converge in
    O(log n) rounds (well under max_rounds), with a constant-size plan and
    nothing but the per-round 1-row metric reaching the driver."""
    from tag_spark.operators.dedup import neardup_clusters

    n = 10_000
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    stats: dict = {}
    res = neardup_clusters(ids, pairs, stats_out=stats)
    row = res.agg(
        F.min("cluster_id"), F.max("cluster_id"), F.count(F.lit(1)), F.sum(F.col("is_canonical").cast("long"))
    ).first()
    assert tuple(row) == (0, 0, n, 1)
    assert stats["rounds"] <= 20, stats  # log2(10^4) ≈ 13.3 + slack; default max_rounds=25 untouched
    plan = res._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 3, plan


def test_neardup_clusters_star_graph_stress(spark):
    """10^5-member STAR — worst-case skew on the min-label hub (every spoke
    joins the hub's label row; the hub aggregates 10^5 neighbor labels in
    one group). Must converge in a couple of rounds with partial-agg
    handling the hot key — no driver blowup, no raised max_rounds."""
    from tag_spark.operators.dedup import neardup_clusters

    n = 100_000
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(1, n).select(F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b"))
    stats: dict = {}
    res = neardup_clusters(ids, pairs, stats_out=stats)
    row = res.agg(
        F.min("cluster_id"), F.max("cluster_id"), F.count(F.lit(1)), F.sum(F.col("is_canonical").cast("long"))
    ).first()
    assert tuple(row) == (0, 0, n, 1)
    assert stats["rounds"] <= 3, stats
