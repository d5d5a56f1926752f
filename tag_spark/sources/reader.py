"""Sources: schema-enforced reads + dialect classification (S1/S2/S9).

The reference sniffs 11 magic bytes and dispatches to a per-format parser
(tag.go:30-66) and can classify without parsing (Identify, id.go:9-81).
Table-scale equivalents:

  read_transcripts      schema-checked scan (parquet now, Iceberg behind a
                        format flag — same call shape as spark.read.format)
  classify_dialect      cheap pre-pass over discriminator columns deciding
                        which constraint suite applies per conversation
  dialect_histogram     groupBy over the classifier — the plan-time branch
                        (submit per-dialect jobs after inspecting it)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tag_spark.schema import TRANSCRIPT_SCHEMA


class SchemaMismatchError(ValueError):
    pass


def open_table(spark: SparkSession, ref: str) -> DataFrame:
    """Open an input by reference: an Iceberg table name (catalog.db.table)
    when the Iceberg runtime is on the classpath, else a parquet path.
    This sandbox ships no iceberg-spark-runtime jar, so the parquet branch
    is the tested one; in production `spark-submit --packages
    org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>` plus the
    catalog confs makes the first branch live (snapshot ids then feed
    CheckpointManifest.snapshot_id for lineage pinning)."""
    if "/" not in ref:
        try:
            return spark.read.format("iceberg").load(ref)
        except Exception as e:  # jar not present / not a table
            raise ValueError(
                f"'{ref}' looks like a table name but the Iceberg runtime is unavailable: {e}"
            ) from e
    return spark.read.parquet(ref)


def table_snapshot(spark: SparkSession, path: str) -> str:
    """Snapshot identity for a path-based table: sha1 over the sorted
    (file, length, mtime) listing — the parquet-level surrogate for an
    Iceberg snapshot id (which pins exactly which data files a read saw).
    Uses the Hadoop FileSystem API, so it works on any FS Spark can reach
    (local, HDFS, S3A), recursing like Spark's own file index and skipping
    the same hidden/_metadata files Spark skips. Any append, overwrite or
    compaction changes the id; CheckpointManifest then refuses to treat
    buckets validated under the old id as complete (lineage pinning,
    plans/checkpoint.py)."""
    import hashlib

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    entries = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        entries.append(f"{f.getPath().toString()}\x1f{f.getLen()}\x1f{f.getModificationTime()}")
    digest = hashlib.sha1("\n".join(sorted(entries)).encode()).hexdigest()
    return f"files-sha1:{digest}"


def read_transcripts(
    spark: SparkSession, path: str, fmt: str = "parquet", strict: bool = True, probe_lines: int = 256
) -> DataFrame:
    """Scan with the canonical schema enforced. In strict mode a missing or
    wrongly-typed column aborts the whole read — the engine analog of the
    reference's abort-class header errors (id3v2.go:249-251). Extra columns
    are tolerated and dropped (skip-unknown-frame semantics,
    id3v2.go:395-396). ``fmt='jsonl'`` routes through the JSONL reader (the
    second-ingest-format analog of cmd/check reading an iTunes XML library
    instead of walking the filesystem, cmd/check/main.go:100-124)."""
    if fmt == "jsonl":
        return read_transcripts_jsonl(spark, path, strict=strict, probe_lines=probe_lines)
    df = spark.read.format(fmt).load(path)
    expected = {f.name: f.dataType.simpleString() for f in TRANSCRIPT_SCHEMA.fields}
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = [c for c in expected if c not in actual]
    wrong = {c: (expected[c], actual[c]) for c in expected if c in actual and actual[c] != expected[c]}
    if strict and (missing or wrong):
        raise SchemaMismatchError(f"missing={missing} wrong_types={wrong}")
    return df.select(*[F.col(c).cast(expected[c]).alias(c) for c in expected if c in actual])


def read_transcripts_jsonl(spark: SparkSession, path: str, strict: bool = True, probe_lines: int = 256) -> DataFrame:
    """JSONL → canonical transcript frame. Two-phase like the reference's
    probe-then-parse: a BOUNDED probe (the first ``probe_lines`` lines —
    full schema inference would read the entire dataset twice at 100 TB)
    decides whether the required columns exist at all (strict mode aborts
    on a missing column — an enforced schema alone would silently null it),
    then the real scan reads with the canonical schema: FAILFAST in strict
    mode (a malformed line or mistyped field aborts, id3v2.go:249-251),
    PERMISSIVE in tolerant mode (bad lines become all-NULL rows for the
    NotNull checks to flag — padding-skip semantics, id3v2.go:277-280)."""
    # NB: JSON writers commonly omit null fields, so a column that is null
    # on EVERY probed line counts as missing — bounded-probe strictness is
    # inherently sampled; raise ``probe_lines`` for pathologically sparse
    # columns, or pass 0 to skip the probe entirely (the enforced-schema
    # scan then silently nulls absent columns for NotNull checks to flag)
    import json as _json

    seen: set[str] = set()
    if probe_lines > 0:
        for r in spark.read.text(path).limit(probe_lines).collect():
            try:
                doc = _json.loads(r["value"])
            except ValueError:
                continue
            if isinstance(doc, dict):
                seen.update(doc.keys())
    expected = [f.name for f in TRANSCRIPT_SCHEMA.fields]
    missing = [c for c in expected if c not in seen]
    if strict and probe_lines > 0 and missing:
        raise SchemaMismatchError(f"missing={missing} wrong_types={{}}")
    mode = "FAILFAST" if strict else "PERMISSIVE"
    return (
        spark.read.schema(TRANSCRIPT_SCHEMA)
        .option("mode", mode)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")
        .json(path)
        .select(*expected)
    )


def classify_dialect(df: DataFrame) -> Column:
    """Per-row dialect from discriminator columns — the Identify analog
    (id.go:21-59's magic switch), pure Catalyst:

      v2-tooluse   any tool usage (richer vocabulary applies)
      v1-chat      plain user/assistant alternation
      system-led   opening system turn
      empty        single empty turn (the without_tags corpus analog)
    """
    return (
        F.when(F.col("tool").isNotNull(), F.lit("v2-tooluse"))
        .when((F.col("turn_idx") == 0) & (F.col("role") == "system"), F.lit("system-led"))
        .when(F.coalesce(F.length("text"), F.lit(0)) == 0, F.lit("empty"))
        .otherwise(F.lit("v1-chat"))
    )


def conversation_dialects(df: DataFrame) -> DataFrame:
    """Conversation-level dialect: 'empty' when every turn's text is empty
    (the without_tags corpus analog, tag_test.go:66-72), else the strongest
    row-level signal (tooluse > system-led > chat). One small agg."""
    rank = (
        F.when(classify_dialect(df) == "v2-tooluse", 3)
        .when(classify_dialect(df) == "system-led", 2)
        .when(classify_dialect(df) == "v1-chat", 1)
        .otherwise(0)
    )
    names = F.array(F.lit("empty"), F.lit("v1-chat"), F.lit("system-led"), F.lit("v2-tooluse"))
    return df.groupBy("conv_id").agg(
        F.when(F.max(F.coalesce(F.length("text"), F.lit(0))) == 0, F.lit("empty"))
        .otherwise(F.element_at(names, F.max(rank).cast("int") + 1))
        .alias("dialect")
    )


def dialect_histogram(df: DataFrame) -> DataFrame:
    """The 11-byte sniff at table scale: one aggregate, no parsing."""
    return conversation_dialects(df).groupBy("dialect").agg(F.count(F.lit(1)).alias("n_convs"))
