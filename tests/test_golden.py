"""Golden-fixture pinning — the engine's answer to the reference's
testdata/with_tags byte-for-byte assertions (tag_test.go:55-84).

The digests pin the EXACT violation rows and verdict matrix for a fixed
(seed, n_convs). Any change to check semantics, reason strings, hashing, or
ordering determinism fails here first — change them deliberately, then
re-pin (commit message must say why)."""

from tag_spark.functions.hashing import frame_digest
from tag_spark.generate import dim_role, dim_tool, generate_transcripts
from tag_spark.operators.suite import default_transcript_suite

VIOL_COLS = ["check_id", "severity", "conv_id", "turn_idx", "column", "reason", "text_sha1", "bucket_id"]
VERD_COLS = ["bucket_id", "check_id", "verdict", "rows_checked", "rows_violating"]

GOLDEN_VIOLATIONS_SHA1 = "931b9e296c7ffb3f51b7e65ae11726b8a672495b"
GOLDEN_VERDICTS_SHA1 = "383f46dcd79d7894d4eaf3906392a35113901380"
GOLDEN_N_VIOLATIONS = 68


def test_golden_fixture_byte_for_byte(spark):
    t = generate_transcripts(spark, n_convs=300, seed=42)
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    res = suite.run(t)
    assert res.violations.count() == GOLDEN_N_VIOLATIONS
    assert frame_digest(res.violations, VIOL_COLS) == GOLDEN_VIOLATIONS_SHA1
    assert frame_digest(res.verdicts, VERD_COLS) == GOLDEN_VERDICTS_SHA1


def test_golden_stable_under_repartition(spark):
    t = generate_transcripts(spark, n_convs=300, seed=42).repartition(13)
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    res = suite.run(t)
    assert frame_digest(res.violations, VIOL_COLS) == GOLDEN_VIOLATIONS_SHA1
