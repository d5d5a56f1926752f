"""Scalar decode-helper analogs (SURVEY.md §2.7) — table-driven like the
reference's util_test.go / id3v2metadata_test.go."""

from pyspark.sql import functions as F

from tag_spark.functions import parsing as P


def _one(spark, col, value, typ="string"):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    return df.select(col.alias("out")).first()["out"]


def test_trim_nuls(spark):
    assert _one(spark, P.trim_nuls("v"), "  hi\x00\x00 ") == "hi"
    assert _one(spark, P.trim_nuls("v"), "\x00") == ""


def test_parse_x_of_n_cases(spark):
    # mirrors id3v2metadata_test.go:9-29 table
    cases = {
        "1/10": (1, 10),
        "1 of 10": (None, None),  # junk → nulls (Go ignores Atoi error)
        " 3 / 6 ": (3, 6),
        "7": (7, None),
        "": (None, None),
        "/5": (None, 5),
    }
    for s, (x, n) in cases.items():
        got = _one(spark, P.parse_x_of_n("v"), s)
        assert (got["x"], got["n"]) == (x, n), s


def test_parse_year_fallbacks(spark):
    cases = {
        "1984": 1984,
        "2001-07-27": 2001,
        "1997-04": 1997,
        "2020-junk": 2020,
        "notayear": None,
        "": None,
    }
    for s, want in cases.items():
        assert _one(spark, P.parse_year("v"), s) == want, s


def test_decode_text_dispatch(spark):
    df = spark.createDataFrame(
        [(b"caf\xe9", 0), ("café".encode("utf-16"), 1), ("café".encode("utf-16-be"), 2), ("café".encode("utf-8"), 3), (b"plain", 9)],
        "v binary, enc int",
    )
    got = [r[0] for r in df.select(P.decode_text("v", "enc")).collect()]
    assert got == ["café", "café", "café", "café", "plain"]


def test_utf16_parity_and_bom(spark):
    assert _one(spark, P.utf16_parity_ok("v"), b"ab", "binary") is True
    assert _one(spark, P.utf16_parity_ok("v"), b"abc", "binary") is False
    assert _one(spark, P.bom_byte_order("v"), b"\xfe\xffxx", "binary") == "BE"
    assert _one(spark, P.bom_byte_order("v"), b"\xff\xfexx", "binary") == "LE"
    assert _one(spark, P.bom_byte_order("v"), b"none", "binary") is None
    # configurable BOM-less default (DefaultUTF16WithBOMByteOrder analog)
    assert _one(spark, P.bom_byte_order("v", default="LE"), b"none", "binary") == "LE"
    assert _one(spark, P.bom_byte_order("v", default="LE"), b"\xfe\xffxx", "binary") == "BE"


def test_split_with_repair(spark):
    got = _one(spark, P.split_with_repair("v"), "desc\x00data")
    assert got == ["desc", "data"]
    got = _one(spark, P.split_with_repair("v"), "desc\x00\x00data")
    assert got == ["desc", "data"]


# the reference's own genre vocabulary positions used by its test corpus
# (id3v2_test.go:133-155): 17=Rock, 93=Psychedelic Rock, 175=Post-Punk,
# 187=Indie Rock, 191=Psybient
_GENRE_VOCAB = [f"g{i}" for i in range(192)]
for _i, _name in [(17, "Rock"), (93, "Psychedelic Rock"), (175, "Post-Punk"), (187, "Indie Rock"), (191, "Psybient")]:
    _GENRE_VOCAB[_i] = _name

# table-driven port of TestGenreExpension (id3v2_test.go:133-155) plus
# out-of-range / depth-3 cases; expectations are the reference's outputs
_GENRE_CASES = {
    "Test": "Test",
    "((17)": "(17)",  # escaped '((' is a literal, not an index
    "(17) Test": "Rock Test",
    "(17)Test": "Rock Test",
    "(17)": "Rock",
    "Test(17)": "Test Rock",
    "Test (17)": "Test Rock",
    "(17)(93)": "Rock Psychedelic Rock",  # fixpoint: 2 rounds
    "(17)Test(93)": "Rock Test Psychedelic Rock",
    "(175)": "Post-Punk",
    "(187)": "Indie Rock",
    "(191)": "Psybient",
    "(17)(93)(175)": "Rock Psychedelic Rock Post-Punk",  # depth-3 nest: 3 rounds
    "(9999)": "(9999)",  # out of range → kept verbatim, loop ends
    "(99999999999)": "(99999999999)",  # hostile >int index tolerated (ANSI try_cast)
    "plain": "plain",
}


def test_expand_indexed_vocab(spark):
    for s, want in _GENRE_CASES.items():
        assert _one(spark, P.expand_indexed_vocab("v", _GENRE_VOCAB), s) == want, s


def test_expand_indexed_vocab_df_fixpoint(spark):
    """The DataFrame-level TRUE fixpoint agrees with the reference outputs
    on every case — including one needing more rounds than the Column
    version's default unroll — and stops early on converged data."""
    rows = [(s,) for s in _GENRE_CASES]
    # 6 sibling indices: needs 6 rounds, beyond the Column default of 4
    deep = "(17)(93)(175)(187)(191)(17)"
    deep_want = "Rock Psychedelic Rock Post-Punk Indie Rock Psybient Rock"
    df = spark.createDataFrame(rows + [(deep,)], ["v"])
    out = P.expand_indexed_vocab_df(df, "v", _GENRE_VOCAB, out_col="expanded")
    got = {r["v"]: r["expanded"] for r in out.collect()}
    for s, want in _GENRE_CASES.items():
        assert got[s] == want, s
    assert got[deep] == deep_want


def test_int_folds(spark):
    # synchsafe: 0x01 0x7f -> 0b0000001_1111111 = 255
    assert _one(spark, P.synchsafe_to_int("v"), b"\x01\x7f", "binary") == 255
    assert _one(spark, P.be_bytes_to_int("v"), b"\x01\x00", "binary") == 256
    assert _one(spark, P.be_bytes_to_int("v"), b"", "binary") == 0


def test_bit_and_magic(spark):
    df = spark.createDataFrame([(5,)], "v int")
    assert df.select(P.test_bit("v", 0).alias("b")).first()["b"] is True
    assert df.select(P.test_bit("v", 1).alias("b")).first()["b"] is False
    assert _one(spark, P.has_magic("v", b"fLaC"), b"fLaCxxxx", "binary") is True
    assert _one(spark, P.has_magic("v", b"fLaC"), b"OggSxxxx", "binary") is False


def test_mime_bimap(spark):
    assert _one(spark, P.ext_to_mime("v"), "JPG") == "image/jpeg"
    assert _one(spark, P.ext_to_mime("v"), "png") == "image/png"
    assert _one(spark, P.mime_to_ext("v"), "image/jpeg") == "jpeg"
    assert _one(spark, P.ext_to_mime("v"), "tiff") is None


def test_base64(spark):
    import base64

    payload = base64.b64encode(b"picture-bytes").decode()
    assert bytes(_one(spark, P.decode_base64("v"), payload)) == b"picture-bytes"


def test_ogg_crc32_matches_bitwise_reference(spark):
    """F17: the OGG CRC (MSB-first, poly 0x04c11db7, init 0, no reflection,
    no final xor — ogg.go:20-47) against an independent bit-by-bit
    implementation, including empty and NULL payloads and length skew
    within one batch."""

    def ref_crc(data: bytes) -> int:  # independent bit-serial CRC
        crc = 0
        for byte in data:
            crc ^= byte << 24
            for _ in range(8):
                crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000 else crc << 1) & 0xFFFFFFFF
        return crc

    payloads = [b"", b"OggS\x00\x02", b"123456789", bytes(range(256)), b"x" * 1000, None]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)], "i long, v binary")
    got = {r["i"]: r["crc"] for r in df.select("i", P.ogg_crc32("v").alias("crc")).collect()}
    for i, p in enumerate(payloads):
        assert got[i] == (None if p is None else ref_crc(p)), (i, p)


def test_ogg_crc32_blocked_path_with_length_skew(spark):
    """A tiny block budget forces many length-bucketed blocks; results must
    be identical to the single-block path (guards the skew/OOM fix)."""
    import random

    rng = random.Random(7)
    payloads = [bytes(rng.randrange(256) for _ in range(rng.choice([0, 3, 10, 40, 200]))) for _ in range(60)]
    payloads.append(bytes(rng.randrange(256) for _ in range(5000)))  # the skewed giant
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)], "i long, v binary")
    big = {r["i"]: r["c"] for r in df.select("i", P.ogg_crc32("v").alias("c")).collect()}
    small = {r["i"]: r["c"] for r in df.select("i", P.ogg_crc32("v", block_budget=256).alias("c")).collect()}
    assert big == small and len(big) == len(payloads)
