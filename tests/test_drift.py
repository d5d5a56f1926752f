"""PSI/KS drift checks over fixed-layout histograms."""

from pyspark.sql import functions as F

from tag_spark.generate import generate_transcripts
from tag_spark.operators.drift import drift_check, histogram, psi_ks, transcript_baseline


def test_histogram_counts_everything(spark, transcripts):
    h = histogram(transcripts, F.length("text"), "text_len", 0.0, 20_000.0, 40)
    total = h.agg(F.sum("count")).first()[0]
    assert total == transcripts.filter(F.col("text").isNotNull()).count()
    # clamped edge buckets: nothing lost for out-of-range values
    assert h.filter((F.col("bucket") < 0) | (F.col("bucket") >= 40)).count() == 0


def test_identical_distributions_no_drift(spark, transcripts):
    base = transcript_baseline(transcripts)
    res = drift_check(spark, base, base).collect()
    assert len(res) == 2
    for r in res:
        assert r["psi"] < 1e-9
        assert r["ks"] < 1e-9
        assert not r["drifted"]


def test_shifted_distribution_drifts(spark):
    a = generate_transcripts(spark, n_convs=300, seed=1, plants=False)
    shifted = a.withColumn("text", F.rpad("text", 5000, "z"))  # text-length blowup
    res = {r["metric"]: r for r in drift_check(spark, transcript_baseline(a), transcript_baseline(shifted)).collect()}
    assert res["text_len"]["drifted"]
    assert res["text_len"]["psi"] > 0.25
    assert not res["ts_hour"]["drifted"]  # ts untouched


def test_psi_ks_math():
    base = {0: 50, 1: 50}
    same = {0: 500, 1: 500}
    psi, ks, nb, nc = psi_ks(base, same)
    assert abs(psi) < 1e-12 and abs(ks) < 1e-12
    skew = {0: 99, 1: 1}
    psi2, ks2, _, _ = psi_ks(base, skew)
    assert psi2 > 0.25
    assert 0.48 < ks2 <= 0.5


def test_multi_histogram_equals_per_metric_histograms(spark, transcripts):
    """The one-scan multi-metric histogram must agree exactly with the
    per-metric histogram() calls it replaces."""
    from pyspark.sql import functions as F

    from tag_spark.operators.drift import histogram, multi_histogram

    multi = multi_histogram(
        transcripts,
        [("text_len", F.length("text"), 0.0, 20000.0, 40), ("ts_hour", F.hour("ts"), 0.0, 24.0, 24)],
    )
    single = histogram(transcripts, F.length("text"), "text_len", 0.0, 20000.0, 40).unionByName(
        histogram(transcripts, F.hour("ts"), "ts_hour", 0.0, 24.0, 24)
    )
    key = lambda r: (r["metric"], r["bucket"])  # noqa: E731
    got = {key(r): (round(r["lo"], 9), round(r["hi"], 9), r["count"]) for r in multi.collect()}
    want = {key(r): (round(r["lo"], 9), round(r["hi"], 9), r["count"]) for r in single.collect()}
    assert got == want
