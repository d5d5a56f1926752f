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
import pandas as pd

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


def _check_query(spark, tmp_path, seed, qname):
    docs = _corpus(seed)
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    sf_dir = str(tmp_path / f"fuzz_{qname}_{seed}")
    spark.createDataFrame(pdf.astype({"doc_id": "int64"})).coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/documents.parquet"
    )
    eng = gate.queries()[qname](spark, sf_dir).collect()
    cols = list(eng[0].asDict().keys()) if eng else None
    con = duckdb.connect()
    con.register("pdf", pdf)
    con.sql("CREATE VIEW documents AS SELECT * FROM pdf")
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
