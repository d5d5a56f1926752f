"""Scalar function analogs of the reference's decode helpers (SURVEY.md §2.7).

Every function is a pure Column expression (JVM-side, codegen'd). Each
docstring cites the reference behavior it re-expresses; semantic quirks
(tolerant parsing, fallback chains, boundary repair) are preserved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- F1: trimString (id3v1.go:112-114) --------------------------------------


def trim_nuls(col: Column | str) -> Column:
    """Strip NUL bytes then surrounding whitespace."""
    return F.trim(F.regexp_replace(_c(col), "\x00", ""))


# --- F2: readTFrame NUL-join (id3v2frames.go:304-314) ------------------------


def strip_embedded_nuls(col: Column | str) -> Column:
    """Remove embedded single-NUL separators inside text frames."""
    return F.regexp_replace(_c(col), "\x00", "")


# --- F4/F5/F6: decodeText 4-way (id3v2frames.go:316-350) ---------------------


def decode_text(bin_col: Column | str, enc_col: Column | str) -> Column:
    """Encoding-byte dispatch: 0=ISO-8859-1, 1=UTF-16 (BOM), 2=UTF-16BE,
    3=UTF-8, anything else falls back to ISO-8859-1 (the reference's
    default branch, id3v2frames.go:347-349)."""
    b, e = _c(bin_col), _c(enc_col)
    return (
        F.when(e == 0, F.decode(b, "ISO-8859-1"))
        .when(e == 1, F.decode(b, "UTF-16"))
        .when(e == 2, F.decode(b, "UTF-16BE"))
        .when(e == 3, F.decode(b, "UTF-8"))
        .otherwise(F.decode(b, "ISO-8859-1"))
    )


def utf16_parity_ok(bin_col: Column | str) -> Column:
    """P9: UTF-16 byte length must be even (id3v2frames.go:409-412)."""
    b = _c(bin_col)
    return b.isNull() | (F.length(b) % 2 == 0)


def bom_byte_order(bin_col: Column | str, default: str | None = None) -> Column:
    """P10: FE FF → BE, FF FE → LE, else ``default`` — the configurable
    BOM-less fallback (`DefaultUTF16WithBOMByteOrder`, id3v2frames.go:18,
    388-407: a package-level var because real files omit the BOM). None
    keeps the strict behavior (caller decides / flags the anomaly)."""
    b = _c(bin_col)
    return (
        F.when(F.substring(b, 1, 2) == F.lit(b"\xfe\xff"), F.lit("BE"))
        .when(F.substring(b, 1, 2) == F.lit(b"\xff\xfe"), F.lit("LE"))
        .otherwise(F.lit(default).cast("string"))
    )


# --- F7: dataSplit boundary repair (id3v2frames.go:357-378) ------------------


def split_with_repair(col: Column | str, delim: str = "\x00") -> Column:
    """Split into exactly 2 parts on the delimiter; if the second part
    starts with another delimiter byte (odd-split boundary), shift it left —
    the reference's UTF-16 boundary repair, expressed conditionally."""
    c = _c(col)
    parts = F.split(c, delim, 2)
    first = F.element_at(parts, 1)
    second = F.element_at(parts, 2)
    repaired = F.when(second.startswith(delim), F.substring(second, 2, 2**31 - 1)).otherwise(second)
    return F.array(first, repaired)


# --- F8: parseXofN (id3v2metadata.go:107-116) --------------------------------


def parse_x_of_n(col: Column | str) -> Column:
    """'3/6' → struct(x=3, n=6). Tolerant like the reference: spaces are
    trimmed, a missing half or junk parses to null (Go ignores the Atoi
    error), a bare '3' gives (3, null)."""
    c = F.trim(_c(col))
    parts = F.split(c, "/", 2)
    # try_cast: junk → null, matching Go's ignored Atoi error (ANSI mode
    # would otherwise throw on malformed input)
    x = F.trim(F.element_at(parts, 1)).try_cast("int")
    n = F.when(F.size(parts) > 1, F.trim(F.element_at(parts, 2)).try_cast("int"))
    return F.struct(x.alias("x"), n.alias("n"))


# --- F9: year parsing fallback chain ------------------------------------------
# (id3v1.go:128-135; id3v2metadata.go:92-105; vorbis.go:212-237; mp4.go:331-338)


def parse_year(col: Column | str) -> Column:
    """Multi-format year: plain int → ISO date (len 10) → ISO year-month
    (len 7) → bare year (len 4) → first-4-chars digits. Null on junk."""
    c = F.trim(_c(col))
    return F.coalesce(
        F.when(c.rlike(r"^\d{4}$"), c.cast("int")),
        F.when(c.rlike(r"^\d{4}-\d{2}-\d{2}"), F.substring(c, 1, 4).cast("int")),
        F.when(c.rlike(r"^\d{4}-\d{2}$"), F.substring(c, 1, 4).cast("int")),
        F.when(F.substring(c, 1, 4).rlike(r"^\d{4}$"), F.substring(c, 1, 4).cast("int")),
    )


# --- F10: genre expansion (id3v2.go:446-469) ----------------------------------


# the reference's exact pattern (id3v2.go:446): the LAST '(NN)' whose '('
# is not itself preceded by '(' — prefix, index, and suffix captured
_INDEXED_VOCAB_RE = r"(.*[^(]|.* |^)\((\d+)\) *(.*)$"


def _expand_round(s: Column, arr: Column, vocab_len: int) -> Column:
    """ONE expansion round with the reference's semantics (id3v2genre,
    id3v2.go:448-467): rightmost valid index is replaced by its vocab
    entry, space-joined with the trimmed prefix and the suffix; an invalid
    index (out of range, or unparseable — try_cast tolerates a hostile
    >9-digit index under ANSI mode) leaves the value unchanged, which also
    ends the fixpoint."""
    m1 = F.regexp_extract(s, _INDEXED_VOCAB_RE, 1)
    idx = F.regexp_extract(s, _INDEXED_VOCAB_RE, 2).try_cast("int")
    m3 = F.regexp_extract(s, _INDEXED_VOCAB_RE, 3)
    return F.when(
        s.rlike(_INDEXED_VOCAB_RE) & (idx < vocab_len),
        F.concat(
            F.when(m1 != "", F.concat(F.trim(m1), F.lit(" "))).otherwise(F.lit("")),
            F.element_at(arr, idx + 1),
            F.when(m3 != "", F.concat(F.lit(" "), m3)).otherwise(F.lit("")),
        ),
    ).otherwise(s)


def expand_indexed_vocab(col: Column | str, vocab: list[str], max_rounds: int = 4) -> Column:
    """Iterative '(NN)' index expansion against a vocabulary — the
    reference's fixpoint loop (id3v2.go:446-469) with a bounded unroll,
    plus the '((' → '(' unescape. Vocab is a literal array
    (broadcast-free lookup).

    Each round expands the RIGHTMOST index, so m sibling indices converge
    in m rounds; a round that changes nothing is a no-op, so over-unrolling
    is harmless for correctness. The unroll multiplies the expression tree
    ~6x per round (runtime cost is bounded by codegen subexpression
    elimination, but analysis time is not) — keep ``max_rounds`` small
    here and use :func:`expand_indexed_vocab_df` for a true data-dependent
    fixpoint on hostile inputs with many indices."""
    arr = F.array(*[F.lit(v) for v in vocab])
    out = _c(col)
    for _ in range(max_rounds):
        out = _expand_round(out, arr, len(vocab))
    return F.replace(out, F.lit("(("), F.lit("("))


def expand_indexed_vocab_df(
    df, col: str, vocab: list[str], out_col: str | None = None, max_rounds: int = 8
):
    """TRUE fixpoint expansion at the DataFrame level: each round applies
    one expansion pass and materializes it (persist + a limit-1 changed
    probe), so expression trees never compound across rounds and the loop
    stops as soon as a round changes nothing — the reference's
    ``for changed`` loop (id3v2.go:449-466) with a hard ``max_rounds``
    bound against unbounded-hostile input. Rounds are data-bounded (one
    per remaining index in the worst value), typically 1-2."""
    out_col = out_col or col
    arr = F.array(*[F.lit(v) for v in vocab])
    cur = df.withColumn("__vx_cur", F.col(col))
    prev_cached = None
    for _ in range(max_rounds):
        nxt = cur.withColumn("__vx_next", _expand_round(F.col("__vx_cur"), arr, len(vocab))).persist()
        changed = nxt.filter(F.col("__vx_next") != F.col("__vx_cur")).limit(1).count()
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = nxt
        cur = nxt.withColumn("__vx_cur", F.col("__vx_next")).drop("__vx_next")
        if changed == 0:
            break
    result = cur.withColumn(out_col, F.replace(F.col("__vx_cur"), F.lit("(("), F.lit("(")))
    return result.drop("__vx_cur") if out_col != "__vx_cur" else result


# --- F11/F12: synchsafe + bit helpers (util.go:13-34) -------------------------


def synchsafe_to_int(bytes_col: Column | str) -> Column:
    """7-bit-chunked 'synchsafe' integer fold over a binary column —
    get7BitChunkedInt (util.go:18-25) as an aggregate over the byte array."""
    b = _c(bytes_col)
    # empty input → 0, the reference's convention (util_test.go:12-120);
    # NB sequence(1, 0) would count DOWN in Spark, so the guard is required
    idxs = F.when(F.length(b) > 0, F.sequence(F.lit(1), F.length(b))).otherwise(F.array().cast("array<int>"))
    return F.aggregate(
        idxs,
        F.lit(0).cast("long"),
        lambda acc, i: F.shiftleft(acc, 7).bitwiseOR(_byte_at(b, i).bitwiseAND(F.lit(127))),
    )


def _byte_at(b: Column, i: Column) -> Column:
    # substring on binary returns 1-byte binary; hex→int converts it
    return F.conv(F.hex(F.substring(b, i, 1)), 16, 10).cast("long")


def be_bytes_to_int(bytes_col: Column | str) -> Column:
    """Big-endian byte fold — getInt (util.go:27-34)."""
    b = _c(bytes_col)
    idxs = F.when(F.length(b) > 0, F.sequence(F.lit(1), F.length(b))).otherwise(F.array().cast("array<int>"))
    return F.aggregate(idxs, F.lit(0).cast("long"), lambda acc, i: F.shiftleft(acc, 8) + _byte_at(b, i))


def test_bit(col: Column | str, n: int) -> Column:
    """getBit (util.go:13-16)."""
    return _c(col).bitwiseAND(F.lit(1 << n)) != 0


# --- F13: base64 embedded blocks (vorbis.go:62-68) ----------------------------


def decode_base64(col: Column | str) -> Column:
    return F.unbase64(_c(col))


# --- F14: MIME/extension bimap (id3v2frames.go:587-593) ------------------------

_MIME = {"jpeg": "image/jpeg", "jpg": "image/jpeg", "png": "image/png", "gif": "image/gif"}


def ext_to_mime(col: Column | str) -> Column:
    c = F.lower(_c(col))
    out = F.lit(None).cast("string")
    chain = None
    for ext, mime in _MIME.items():
        chain = F.when(c == ext, F.lit(mime)) if chain is None else chain.when(c == ext, F.lit(mime))
    return chain.otherwise(out)


def mime_to_ext(col: Column | str) -> Column:
    c = F.lower(_c(col))
    chain = None
    for ext, mime in _MIME.items():
        if ext == "jpg":
            continue
        chain = F.when(c == mime, F.lit(ext)) if chain is None else chain.when(c == mime, F.lit(ext))
    return chain.otherwise(F.lit(None).cast("string"))


# --- F15: magic prefix sniff (mp4.go:54-55, tag.go:41-56) ----------------------


def has_magic(bin_col: Column | str, magic: bytes) -> Column:
    return F.substring(_c(bin_col), 1, len(magic)) == F.lit(magic)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_DIMS_T = "struct<width:int,height:int>"


def png_ihdr_dims(bin_col: Column | str) -> Column:
    """REAL PNG dimension decode with zero dependencies: the IHDR chunk is
    mandatory-first by spec, so width/height are fixed-offset u32-BE
    fields at bytes 17-20 / 21-24 (1-indexed: 8 signature + 4 chunk length
    + 'IHDR'). Pure JVM expressions (substring + hex + conv) — same
    byte-fold family as be_bytes_to_int (getInt, util.go:27-34); NULL for
    non-PNG, truncated, or IHDR-less payloads (those fall back to the
    honestly-labeled stub decoder). Reference analog: Picture payload
    fields, id3v2frames.go:545-551; PNG sniff, mp4.go:54-55."""
    b = _c(bin_col)
    ok = has_magic(b, PNG_MAGIC) & (F.substring(b, 13, 4) == F.lit(b"IHDR")) & (F.length(b) >= 24)
    w = F.conv(F.hex(F.substring(b, 17, 4)), 16, 10).cast("int")
    h = F.conv(F.hex(F.substring(b, 21, 4)), 16, 10).cast("int")
    return F.when(ok, F.struct(w.alias("width"), h.alias("height"))).otherwise(F.lit(None).cast(_DIMS_T))


def gif_screen_dims(bin_col: Column | str) -> Column:
    """REAL GIF dimension decode: the logical-screen descriptor directly
    follows the 6-byte signature, width/height as u16-LE at bytes 7-8 /
    9-10 — little-endian fold like readUint32LE (util.go:96-102), two
    bytes wide. NULL for non-GIF / truncated payloads."""
    b = _c(bin_col)
    sig = F.substring(b, 1, 6)
    ok = ((sig == F.lit(b"GIF87a")) | (sig == F.lit(b"GIF89a"))) & (F.length(b) >= 10)
    w = (_byte_at(b, F.lit(7)) + _byte_at(b, F.lit(8)) * 256).cast("int")
    h = (_byte_at(b, F.lit(9)) + _byte_at(b, F.lit(10)) * 256).cast("int")
    return F.when(ok, F.struct(w.alias("width"), h.alias("height"))).otherwise(F.lit(None).cast(_DIMS_T))


# --- F17: OGG page CRC-32 (ogg.go:20-47) --------------------------------------

# The OGG spec CRC is MSB-first, poly 0x04c11db7, init 0, no reflection, no
# final xor — which matches neither Spark's builtin crc32 nor zlib (both are
# the reflected 0xEDB88320 variant), so this is the one §2.7 function that
# needs a UDF. The standard byte-at-a-time table (public CRC construction):
_OGG_CRC_TABLE = None


def _ogg_crc_table():
    global _OGG_CRC_TABLE
    if _OGG_CRC_TABLE is None:
        import numpy as np

        t = []
        for i in range(256):
            crc = i << 24
            for _ in range(8):
                crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000 else crc << 1) & 0xFFFFFFFF
            t.append(crc)
        _OGG_CRC_TABLE = np.array(t, dtype=np.uint32)
    return _OGG_CRC_TABLE


def ogg_crc32(col: Column | str, block_budget: int = 64 << 20) -> Column:
    """OGG page checksum over a binary column, vectorized ACROSS ROWS: the
    CRC recurrence is sequential per payload, so the batch is processed
    column-of-bytes at a time — one numpy table-lookup step per byte
    POSITION updates every row's running CRC at once (O(max_len) vector ops
    per Arrow batch, no per-row Python loop). NULL payloads yield NULL."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def _crc_fn(payloads):
        table = _ogg_crc_table()
        vals = payloads.tolist()
        n = len(vals)
        lens = np.array([len(b) if b is not None else -1 for b in vals], dtype=np.int64)
        out = np.zeros(n, dtype=np.int64)

        def crc_block(rows):
            """Columnar CRC over a length-homogeneous block of row indices:
            pad only to the BLOCK's max length. Blocks are carved from the
            length-sorted order under an area budget, so one 10 MB payload
            among 10k short rows never allocates n x max_len (the dense
            whole-batch pad would be ~100 GB there)."""
            m = int(lens[rows].max())
            padded = np.zeros((len(rows), max(m, 1)), dtype=np.uint8)
            for k, r in enumerate(rows):
                b = vals[r]
                if b:
                    padded[k, : len(b)] = np.frombuffer(bytes(b), dtype=np.uint8)
            crc = np.zeros(len(rows), dtype=np.uint32)
            blens = lens[rows]
            for j in range(m):
                live = blens > j
                idx = ((crc[live] >> 24) ^ padded[live, j]) & 0xFF
                crc[live] = ((crc[live] << 8) ^ table[idx]).astype(np.uint32)
            out[rows] = crc.astype(np.int64)

        order = np.argsort(lens)  # short rows group together
        budget = block_budget  # ≤ this much pad per block
        block: list[int] = []
        block_max = 0
        for r in order:
            if lens[r] <= 0:
                continue
            new_max = max(block_max, int(lens[r]))
            if block and (len(block) + 1) * new_max > budget:
                crc_block(np.array(block))
                block, block_max = [], 0
                new_max = int(lens[r])
            block.append(int(r))
            block_max = new_max
        if block:
            crc_block(np.array(block))
        return pd.Series([None if L < 0 else int(v) for L, v in zip(lens, out)], dtype="Int64")

    # module uses `from __future__ import annotations` (stringified hints),
    # which pandas_udf's hint inspection can't resolve — set real objects
    _crc_fn.__annotations__ = {"payloads": pd.Series, "return": pd.Series}
    _crc = pandas_udf(_crc_fn, "long")
    return _crc(_c(col))
