"""Cross-engine fuzz: the ACTUAL driver oracle SQL strings replayed against
GENERATED corpora, not just the fixed /root/testdata tables.

The driver gate proves engine==oracle on one seeded corpus; this test
proves the equality is a property of the definitions, not an accident of
that corpus (the failure class the round-4 advisory flagged for the
cluster oracle). Corpus text deliberately stresses tokenization edges:
multi-space runs, tabs/newlines, leading/trailing whitespace, empties,
NULLs, CJK, punctuation-only — while staying inside the Java-regex ∩ RE2
common whitespace subset ([ \\t\\n]: Java \\s also matches \\x0B which
RE2's does not, so vertical tabs are out of contract by design)."""

from __future__ import annotations

import random

import duckdb

import __spark_entry__ as gate

_WORDS = ["alpha", "beta?", "好", "x", "...", "a-b", "TOKEN", "9", "ÿz"]
_SEPS = [" ", "  ", "\t", "\n", " \t ", "   "]


def _corpus(seed: int, n: int = 40) -> list[tuple[int, str | None]]:
    rng = random.Random(seed)
    docs: list[tuple[int, str | None]] = []
    for i in range(n):
        roll = rng.random()
        if roll < 0.08:
            docs.append((i * 3, None))
        elif roll < 0.16:
            docs.append((i * 3, ""))
        elif roll < 0.24:
            docs.append((i * 3, rng.choice(_SEPS)))  # whitespace-only
        else:
            k = rng.randint(1, 120)
            body = rng.choice(_SEPS).join(rng.choice(_WORDS) for _ in range(k))
            pad_l = rng.choice(["", " ", "\n "])
            pad_r = rng.choice(["", " ", "\t"])
            docs.append((i * 3, pad_l + body + pad_r))
    # guaranteed exact duplicates so dedup summaries exercise the dup arm
    texts = [t for _, t in docs if t]
    if texts:
        docs.append((docs[-1][0] + 1, texts[0]))
        docs.append((docs[-1][0] + 1, texts[0]))
    return docs


def _canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def _check_query(spark, tmp_path, seed, qname, table="documents", sdf=None, tables=None):
    """Run queries()[qname] on a generated ``table`` parquet dir AND the
    matching oracle_sql() on the same rows in DuckDB (reading the SAME
    Spark-written parquet — the driver's exact wiring); compare
    canonically. ``sdf`` defaults to the documents corpus for ``seed``;
    pass ``tables`` ({name: sdf}) for multi-table queries."""
    if tables is None:
        if sdf is None:
            sdf = spark.createDataFrame(_corpus(seed), "doc_id long, text string")
        tables = {table: sdf}
    sf_dir = str(tmp_path / f"fuzz_{qname}_{seed}")
    con = duckdb.connect()
    for tname, tdf in tables.items():
        tdf.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/{tname}.parquet")
        # DuckDB reads the SAME parquet Spark wrote — the driver's exact
        # wiring (a registered pandas frame would carry ns timestamps and
        # overflow on the year-9999 plants the transcript view generates)
        con.sql(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{sf_dir}/{tname}.parquet/*.parquet')")
    eng = gate.queries()[qname](spark, sf_dir).collect()
    cols = list(eng[0].asDict().keys()) if eng else None
    ora = con.sql(gate.oracle_sql()[qname]).fetchall()
    ora_cols = [d[0] for d in con.sql(gate.oracle_sql()[qname]).description]
    if cols is None:
        assert not ora, f"{qname}: oracle returned rows, engine none"
        return
    got = _canon([tuple(r[c] for c in cols) for r in eng], cols)
    exp = _canon([tuple(dict(zip(ora_cols, r))[c] for c in cols) for r in ora], cols)
    assert got == exp, f"{qname} seed={seed}: engine != oracle on generated corpus"


def test_doc_chunks_oracle_holds_on_generated_corpora(spark, tmp_path):
    for seed in (1, 2, 3):
        _check_query(spark, tmp_path, seed, "doc_chunks")


def test_doc_pack_offsets_oracle_holds_on_generated_corpora(spark, tmp_path):
    for seed in (11, 12, 13):
        _check_query(spark, tmp_path, seed, "doc_pack_offsets")


def test_doc_token_totals_oracle_holds_on_generated_corpora(spark, tmp_path):
    for seed in (21, 22):
        _check_query(spark, tmp_path, seed, "doc_token_totals")


def test_doc_profile_oracle_holds_on_generated_corpora(spark, tmp_path):
    # quality (6dp-rounded floats), lang-id marker scores incl. the CJK
    # arm, and the normalized md5 fingerprint — all on generated text
    for seed in (31, 32):
        _check_query(spark, tmp_path, seed, "doc_profile")


def test_doc_dedup_and_histogram_oracles_hold_on_generated_corpora(spark, tmp_path):
    for seed in (41, 42):
        _check_query(spark, tmp_path, seed, "doc_exact_dedup_summary")
        _check_query(spark, tmp_path, seed, "doc_len_histogram")


def test_doc_hash_and_repetition_oracles_hold_on_generated_corpora(spark, tmp_path):
    # md5 NULL-in-NULL-out, Gopher repetition fractions (word/bigram
    # tokenization over messy whitespace), and the clamped drift histogram
    for seed in (51, 52):
        _check_query(spark, tmp_path, seed, "doc_text_md5")
        _check_query(spark, tmp_path, seed, "doc_repetition_profile")
        _check_query(spark, tmp_path, seed, "doc_len_drift_histogram")


def test_dedup_pair_oracles_hold_on_generated_corpora(spark, tmp_path):
    # the heavy dedup replays (inverted-index jaccard, md5-simhash) on a
    # corpus with planted exact duplicates — small n keeps the unrolled
    # oracle SQL fast
    for seed in (61,):
        _check_query(spark, tmp_path, seed, "doc_jaccard_pairs")
        _check_query(spark, tmp_path, seed, "simhash_docs")


def _events_corpus(seed: int, n: int = 150):
    """Generated event stream: few hot users (plus NULL user AND NEGATIVE
    users — sign-of-dividend `%` bucketing must match the oracle's DuckDB
    `%`, the r5 ADVICE parity class: -5 % 64 = -5 in both, where pmod gave
    59), a 2-hour ts span so 30-min session gaps and 1-hour range windows
    both trigger, NULL timestamps/values, and PLANTED exact-(user, ts)
    ties so every tie-break rule is exercised."""
    rng = random.Random(seed)
    base = 1_700_000_000
    rows = []
    for i in range(n):
        user = rng.choice([None, 1, 2, 3, 7, -5, -130])
        ts = None if rng.random() < 0.05 else base + rng.randint(0, 7200)
        etype = rng.choice(["click", "error", "view", "purchase", None])
        value = rng.choice([None, -1.5, 0.0, 2.25, 10.0])
        rows.append((i, ts, user, etype, value, None))
    rows.append((n, base + 100, 1, "error", 1.0, None))
    rows.append((n + 1, base + 100, 1, "error", 2.0, None))
    rows.append((n + 2, base + 100, 1, "click", None, None))
    rows.append((n + 3, base + 100, 1, "click", None, None))
    return rows


def _events_frames(spark, seed):
    import datetime

    rows = [
        (eid, datetime.datetime.utcfromtimestamp(ts) if ts is not None else None, u, et, v, p)
        for eid, ts, u, et, v, p in _events_corpus(seed)
    ]
    # explicit DDL schema: all-NULL columns (props) must stay typed —
    # inference would produce NullType, which DuckDB reads back as BOOLEAN
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_event_stream_oracles_hold_on_generated_streams(spark, tmp_path):
    # sessionization (gap windows + tie-breaks), as-of attribution (vs
    # DuckDB's native ASOF JOIN), and the binned range join (vs the raw
    # inequality join) on generated event streams
    for seed in (71, 72):
        sdf = _events_frames(spark, seed)
        for qname in ("events_sessionization", "events_asof_attribution", "events_range_join_counts"):
            _check_query(spark, tmp_path, seed, qname, table="events", sdf=sdf)


def test_validation_suite_oracles_hold_on_generated_streams(spark, tmp_path):
    # the engine's violation/verdict loop and uniqueness screen vs their
    # SQL replays, on event streams with NULL ids/types/values/ts
    for seed in (81, 82):
        sdf = _events_frames(spark, seed)
        for qname in ("events_violations", "events_verdicts", "unique_event_id_summary", "events_ts_span"):
            _check_query(spark, tmp_path, seed, qname, table="events", sdf=sdf)


def _embeddings_frames(spark, seed, dim=8, n=40):
    """Integer-component float vectors (exact in double, so both engines'
    sums round identically at 6dp), plus adversarial rows: the all-zero
    vector (cosine divide-by-zero), exact duplicates of the query vector
    (ties at the top), and a negated query (cos = -1)."""
    rng = random.Random(seed)
    rows = [(0, [float(rng.randint(-3, 3)) or 1.0 for _ in range(dim)], 0)]
    for i in range(1, n):
        rows.append((i, [float(rng.randint(-3, 3)) for _ in range(dim)], i % 5))
    rows.append((n, [0.0] * dim, 0))  # zero vector
    rows.append((n + 1, list(rows[0][1]), 1))  # exact dup of the query
    rows.append((n + 2, [-x for x in rows[0][1]], 2))  # negated query
    return spark.createDataFrame(
        [(int(v), [float(x) for x in e], int(l)) for v, e, l in rows],
        "vec_id long, embedding array<float>, label int",
    )


def test_embedding_oracles_hold_on_generated_vectors(spark, tmp_path):
    for seed in (91, 92):
        sdf = _embeddings_frames(spark, seed)
        for qname in ("embedding_topk", "embedding_quantized_stats"):
            _check_query(spark, tmp_path, seed, qname, table="embeddings", sdf=sdf)


def test_transcript_derived_oracles_hold_on_generated_streams(spark, tmp_path):
    # the flagship full-suite run, digests, canonical view and
    # declared-count checks over the events-derived transcript view,
    # on generated streams with NULL ids/types/ts
    for seed in (101,):
        sdf = _events_frames(spark, seed)
        for qname in (
            "transcript_violations",
            "conversation_digests",
            "payload_digests_md5",
            "exclusion_digests_md5",
            "events_canonical",
            "declared_turns_check",
        ):
            _check_query(spark, tmp_path, seed, qname, table="events", sdf=sdf)


def test_drift_oracle_holds_on_generated_streams(spark, tmp_path):
    # PSI/KS replay: empty histogram buckets stress the smoothed-ratio
    # divisions on both sides
    for seed in (111, 112):
        sdf = _events_frames(spark, seed)
        _check_query(spark, tmp_path, seed, "events_drift_check", table="events", sdf=sdf)


def _docs_full_frames(spark, seed):
    """Documents corpus extended with lang/source/n_chars (NULL lang rows
    included — a stratum key edge) for the sampling queries."""
    rng = random.Random(seed + 7)
    rows = []
    for doc_id, text in _corpus(seed):
        lang = rng.choice([None, "en", "de", "es", "zh"])
        rows.append((doc_id, text, lang, f"src{doc_id % 5}", len(text) if text else None))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_sampling_and_props_oracles_hold_on_generated_data(spark, tmp_path):
    # md5-ordered stratified sampling (NULL stratum rows included),
    # Exchange-free hash sampling, and the JSON k-stats extraction with
    # malformed / missing-key / NULL props
    for seed in (121, 122):
        sdf = _docs_full_frames(spark, seed)
        for qname in ("doc_stratified_sample", "doc_hash_sample_stats"):
            _check_query(spark, tmp_path, seed, qname, table="documents", sdf=sdf)
    for seed in (131,):
        rng = random.Random(seed)
        rows = []
        for i in range(120):
            props = rng.choice(
                [None, '{"k": %d}' % rng.randint(-5, 99), '{"j": 1}', "not json", "{}", '{"k": null}']
            )
            rows.append((i, None, i % 7, "click", 1.0, props))
        import datetime

        sdf = spark.createDataFrame(
            [(e, datetime.datetime.utcfromtimestamp(1_700_000_000 + e), u, t, v, p) for e, _, u, t, v, p in rows],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
        _check_query(spark, tmp_path, seed, "props_json_k_stats", table="events", sdf=sdf)


def _lineitem_frames(spark, seed, n=200):
    """Generated lineitem with the decimal-parity landmines: money values
    at 2dp including .005-boundary cents, NULL quantities/prices/flags,
    negative and zero quantities, duplicate (orderkey, linenumber) keys
    and out-of-order linenumbers for the window checks."""
    import datetime

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        ok = rng.randint(1, 30)
        ln = rng.randint(1, 7)
        qty = rng.choice([None, -2.0, 0.0, 1.0, 17.0, 50.0])
        price = rng.choice([None, 0.01, 901.005, 1234.56, 99999.99])
        disc = rng.choice([None, 0.0, 0.05, 0.1, 1.5])  # 1.5 = out-of-range plant
        tax = rng.choice([None, 0.0, 0.08])
        rf = rng.choice([None, "A", "N", "R", "X"])  # X = vocab violation
        ls = rng.choice(["O", "F"])
        ship = datetime.datetime.utcfromtimestamp(1_600_000_000 + rng.randint(0, 10_000_000))
        rows.append((ok, rng.randint(1, 99), rng.randint(1, 99), ln, qty, price, disc, tax, rf, ls, ship))
    rows.append(rows[-1])  # exact duplicate key row (unique check)
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )


def test_lineitem_oracles_hold_on_generated_tables(spark, tmp_path):
    # decimal-cast money aggregation (q1), per-bucket stats, exact
    # quantiles, and the violation suite over adversarial lineitem rows
    for seed in (141, 142):
        sdf = _lineitem_frames(spark, seed)
        for qname in ("q1_pricing_summary", "stats_lineitem_buckets", "stats_quantiles_exact", "lineitem_violations"):
            _check_query(spark, tmp_path, seed, qname, table="lineitem", sdf=sdf)


def test_referential_and_profile_oracles_hold_on_generated_tables(spark, tmp_path):
    # broadcast anti-join orphan counting with NULL foreign keys (a NULL
    # FK is not an orphan under anti-join semantics — both engines must
    # agree), plus the one-pass null-rate profile
    import datetime

    for seed in (151, 152):
        rng = random.Random(seed)
        orders = []
        for i in range(150):
            ck = rng.choice([None, rng.randint(1, 40), rng.randint(100, 120)])  # 100+ = orphans
            orders.append(
                (
                    i,
                    ck,
                    rng.choice([None, "O", "F", "P"]),
                    rng.choice([None, 0.0, 901.005, 5.5]),
                    rng.choice([None, datetime.datetime(2020, 1, 1 + rng.randint(0, 27))]),
                    rng.choice([None, "1-URGENT", "5-LOW"]),
                )
            )
        odf = spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
            "o_orderdate timestamp, o_orderpriority string",
        )
        cust = [(k, f"c{k}", k % 5, 1.0, "SEG") for k in range(1, 41)] + [(None, "cnull", 0, 0.0, "SEG")]
        cdf = spark.createDataFrame(
            cust, "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string"
        )
        _check_query(
            spark, tmp_path, seed, "ref_orders_customer_orphans", tables={"orders": odf, "customer": cdf}
        )
        _check_query(spark, tmp_path, seed, "null_profile_orders", tables={"orders": odf})
