"""Property-based adversarial tests — the TestFuzz analog (sum_test.go:8-40):
hostile inputs must produce violations or nulls, never exceptions.

Hypothesis drives the INPUT GENERATION; each property batches its examples
into ONE DataFrame so the Spark round-trip cost stays sane."""

import datetime

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

import pytest

from tag_spark.functions.parsing import parse_x_of_n, parse_year
from tag_spark.generate import dim_role, dim_tool
from tag_spark.operators.drift import psi_ks
from tag_spark.operators.suite import default_transcript_suite
from tag_spark.operators.text import lang_id, quality_score, token_count

TEXTS = st.one_of(
    st.none(),
    st.text(max_size=200),
    st.text(alphabet="\x00\x1f\t\n 🚀你👍", max_size=50),
)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=30)), min_size=1, max_size=50))
def test_parse_functions_never_throw(_spark, values):
    df = _spark.createDataFrame([(v,) for v in values], "v string")
    rows = df.select(parse_x_of_n("v").alias("xn"), parse_year("v").alias("y")).collect()
    for r in rows:
        assert r["y"] is None or isinstance(r["y"], int)


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=40))
def test_text_ops_total_functions(_spark, texts):
    df = _spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(
        token_count("t").alias("n"),
        quality_score("t").alias("q"),
        lang_id("t").alias("lang"),
    ).collect()
    for r in rows:
        assert r["n"] is None or r["n"] >= 0
        assert r["q"] is None or 0.0 <= r["q"] <= 1.0
        assert r["lang"] in {"en", "de", "es", "fr", "zh", "und"}


@settings(max_examples=50, deadline=None)
@given(
    st.dictionaries(st.integers(0, 20), st.integers(0, 10_000), min_size=1, max_size=20),
    st.dictionaries(st.integers(0, 20), st.integers(0, 10_000), min_size=1, max_size=20),
)
def test_psi_ks_math_properties(base, cur):
    psi, ks, nb, nc = psi_ks(base, cur)
    assert 0.0 <= ks <= 1.0 + 1e-9
    assert psi >= -1e-9  # PSI is a sum of non-negative KL-style terms
    psi2, ks2, _, _ = psi_ks(base, base)
    assert abs(psi2) < 1e-9 and abs(ks2) < 1e-9


def test_adversarial_rows_violate_never_crash(spark):
    """Hand-picked hostile rows through the FULL suite (fuzz corpus style)."""
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("", None, None, None, None, None),  # everything null-ish
        ("c", -2147483648, "role\x00evil", "\x00" * 50, "t" * 1000, ts),
        ("c", 2147483647, "ROBOT", "🚀" * 10_000, "", datetime.datetime(9999, 12, 31)),
        ("c", 0, "user", "a" * 100_000, "bash", datetime.datetime(1902, 1, 1)),
        ("\x1f\x1f", 0, "user", "sep\x1finjection", None, ts),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    res = suite.run(df)
    v = res.violations.collect()  # must not raise
    assert len(v) > 0
    assert res.verdicts.filter(F.col("verdict") == "FAIL").count() > 0


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # conv
            st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),  # idx
            st.one_of(st.none(), st.text(max_size=12)),  # text
        ),
        min_size=1,
        max_size=25,
    )
)
def test_conversation_digest_md5_matches_python_reference(_spark, rows):
    """Property: the md5 conversation digest equals an independent pure-
    Python recomputation for ANY data shape — null idx/text, duplicate idx,
    arbitrary unicode — i.e. the exact contract the DuckDB oracle relies on."""
    import hashlib

    from tag_spark.functions.hashing import conversation_digest

    df = _spark.createDataFrame(rows, "conv_id int, turn_idx int, text string")
    got = {r["conv_id"]: (r["conv_md5"], r["n_turns"]) for r in conversation_digest(df, algo="md5").collect()}

    SEP = "\x1f"

    def row_h(c, i, t):
        parts = [str(c), "<null>" if i is None else str(i), "<null>" if t is None else t]
        return hashlib.md5(SEP.join(parts).encode()).hexdigest()

    want = {}
    by_conv = {}
    for c, i, t in rows:
        by_conv.setdefault(c, []).append((-(1 << 62) if i is None else i, row_h(c, i, t)))
    for c, hs in by_conv.items():
        ordered = [h for _, h in sorted(hs)]
        want[c] = (hashlib.md5(SEP.join(ordered).encode()).hexdigest(), len(hs))
    assert got == want
