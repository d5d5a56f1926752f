"""S5 atom-walker analog: schema-recursive flattening of nested columns."""

from pyspark.sql import functions as F

from tag_spark.operators.nested import flatten_nested, leaf_paths


def _nested_df(spark):
    # moov/udta/meta/ilst-style nesting: struct-in-struct + array of structs
    return spark.createDataFrame(
        [
            (1, {"udta": {"meta": "m1"}, "n": 2}, [{"name": "trkn", "val": "1/10"}, {"name": "covr", "val": "img"}]),
            (2, {"udta": {"meta": "m2"}, "n": 0}, []),
        ],
        "file_id long, moov struct<udta:struct<meta:string>, n:int>, ilst array<struct<name:string, val:string>>",
    )


def test_flatten_structs_and_arrays(spark):
    flat = flatten_nested(_nested_df(spark))
    assert [f.dataType.simpleString() for f in flat.schema.fields if "struct" in f.dataType.simpleString()] == []
    rows = {(r["file_id"], r["ilst.idx"]): r for r in flat.collect()}
    # two atoms for file 1, ORDER preserved via the position column
    assert rows[(1, 0)]["ilst.name"] == "trkn" and rows[(1, 1)]["ilst.name"] == "covr"
    assert rows[(1, 0)]["moov.udta.meta"] == "m1"
    # empty container keeps its row (posexplode_outer), atoms all null
    assert rows[(2, None)]["ilst.name"] is None and rows[(2, None)]["moov.n"] == 0


def test_unknown_types_kept_verbatim(spark):
    # seek-past-unknown: maps/binaries are not descended into, just carried
    df = spark.createDataFrame([(1, {"k": "v"}, bytearray(b"\x00raw"))], "i long, m map<string,string>, b binary")
    flat = flatten_nested(df)
    assert set(flat.columns) == {"i", "m", "b"}
    assert bytes(flat.first()["b"]) == b"\x00raw"


def test_leaf_paths_inventory(spark):
    paths = leaf_paths(_nested_df(spark))
    assert paths == ["file_id", "moov.udta.meta", "moov.n", "ilst[].name", "ilst[].val"]


def test_flatten_nested_arrays_of_arrays(spark):
    """array<array<...>> needs depth-unique position columns: outer and
    inner offsets must both survive (regression: a fixed '<name>.idx' alias
    produced two indistinguishable columns)."""
    df = spark.createDataFrame([(1, [[10, 11], [20]])], "i long, a array<array<int>>")
    flat = flatten_nested(df)
    assert sorted(flat.columns) == ["a", "a.idx", "a.idx2", "i"]
    rows = {(r["a.idx"], r["a.idx2"]): r["a"] for r in flat.collect()}
    assert rows == {(0, 0): 10, (0, 1): 11, (1, 0): 20}
    # three levels flatten without ambiguity errors
    df3 = spark.createDataFrame([(1, [[[7]]])], "i long, a array<array<array<int>>>")
    flat3 = flatten_nested(df3)
    assert flat3.first()["a"] == 7
