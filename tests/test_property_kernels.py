"""Property-based tests (hypothesis) for the pure-Python/numpy kernels that
back the Arrow-batched UDFs — no SparkSession needed, so hypothesis can run
hundreds of examples cheaply.

Covered kernels:
  * jpeg_sof_dims — the variable-offset SOF marker walk (multimodal.py):
    dims must survive ARBITRARY legal segment prefixes (COM/APPn/DQT of any
    length, fill bytes, restart markers) and must never crash or misread on
    arbitrary junk bytes.
  * _rolling_hash_batch — the vectorized Rabin-Karp fingerprint (text.py):
    the flat-buffer reduceat implementation must equal the obvious per-doc
    scalar loop on any unicode input mix, in any batch order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tag_spark.operators.multimodal import jpeg_sof_dims
from tag_spark.operators.text import _rolling_hash_batch

# --- jpeg_sof_dims ----------------------------------------------------------


def _seg(marker: int, data: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(data) + 2).to_bytes(2, "big") + data


# legal variable-length segments that may precede SOF: COM, APP0-APP15, DQT,
# DHT, DRI-ish payloads (content is opaque to the walker)
_skippable = st.sampled_from([0xFE, 0xE0, 0xE5, 0xEF, 0xDB, 0xC4])


@st.composite
def jpeg_streams(draw):
    width = draw(st.integers(1, 65535))
    height = draw(st.integers(1, 65535))
    prefix = b"\xff\xd8"
    for _ in range(draw(st.integers(0, 5))):
        kind = draw(st.integers(0, 2))
        if kind == 0:  # variable-length skippable segment
            data = draw(st.binary(min_size=0, max_size=80))
            prefix += _seg(draw(_skippable), data)
        elif kind == 1:  # fill bytes before a marker (B.1.1.2)
            prefix += b"\xff" * draw(st.integers(1, 3))
            data = draw(st.binary(min_size=0, max_size=10))
            prefix += bytes([draw(_skippable)]) + (len(data) + 2).to_bytes(2, "big") + data
        else:  # standalone marker (TEM / RSTn), no length field
            prefix += bytes([0xFF, draw(st.sampled_from([0x01, 0xD0, 0xD5, 0xD7]))])
    sof_marker = draw(st.sampled_from([0xC0, 0xC1, 0xC2, 0xC3, 0xC9]))
    sof = _seg(
        sof_marker,
        b"\x08" + height.to_bytes(2, "big") + width.to_bytes(2, "big") + b"\x01\x11\x00",
    )
    return prefix + sof + b"\xff\xd9", width, height


@settings(max_examples=300, deadline=None)
@given(jpeg_streams())
def test_jpeg_sof_dims_recovers_planted_dims(case):
    stream, width, height = case
    assert jpeg_sof_dims(stream) == (width, height)


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_jpeg_sof_dims_never_crashes_on_junk(b):
    out = jpeg_sof_dims(b)
    assert out is None or (
        isinstance(out, tuple) and 0 <= out[0] <= 65535 and 0 <= out[1] <= 65535
    )


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=120), st.integers(0, 3))
def test_jpeg_sof_dims_junk_after_soi_is_rejected_or_bounded(junk, fills):
    # a stream that starts like a JPEG but desynchronizes must return None,
    # never a value read from unaligned bytes beyond the buffer
    stream = b"\xff\xd8" + b"\xff" * fills + junk
    out = jpeg_sof_dims(stream)
    if out is not None:
        # if the junk happened to spell a legal walk, the dims must have
        # come from inside the buffer (the walker checks i+9 <= n)
        assert len(stream) >= 9


# --- _rolling_hash_batch ----------------------------------------------------


def _scalar_rolling_hash(text: str | None) -> int:
    if not text:
        return 0
    h = 0
    for byte in text.encode("utf-8", "surrogatepass"):
        h = (h * 257 + byte) % (1 << 64)
    return h - (1 << 64) if h >= (1 << 63) else h  # int64 view


texts_strategy = st.lists(
    st.one_of(st.none(), st.text(max_size=40)),
    min_size=0,
    max_size=12,
)


@settings(max_examples=300, deadline=None)
@given(texts_strategy)
def test_rolling_hash_batch_equals_scalar_loop(texts):
    got = _rolling_hash_batch(pd.Series(texts, dtype=object)).tolist()
    assert got == [_scalar_rolling_hash(t) for t in texts]


@settings(max_examples=100, deadline=None)
@given(texts_strategy)
def test_rolling_hash_batch_is_order_equivariant(texts):
    # per-document values must not depend on batch packing/order: the flat
    # buffer + reduceat partitioning is per-segment exact
    fwd = _rolling_hash_batch(pd.Series(texts, dtype=object)).tolist()
    rev = _rolling_hash_batch(pd.Series(list(reversed(texts)), dtype=object)).tolist()
    assert fwd == list(reversed(rev))
    singles = [_rolling_hash_batch(pd.Series([t], dtype=object)).tolist()[0] for t in texts]
    assert fwd == singles


def test_rolling_hash_known_value():
    # pin one concrete value against the definition so both implementations
    # cannot drift together: hash("ab") = 97*257 + 98
    assert _scalar_rolling_hash("ab") == 97 * 257 + 98
    assert _rolling_hash_batch(pd.Series(["ab"], dtype=object)).tolist() == [97 * 257 + 98]


def test_rolling_hash_wraparound_matches_numpy_uint64():
    # a long all-0xFF-byte doc exercises many modular wraps
    s = "ÿ" * 500  # two UTF-8 bytes each, 1000 bytes total
    assert _rolling_hash_batch(pd.Series([s], dtype=object)).tolist() == [_scalar_rolling_hash(s)]


def test_rolling_hash_numpy_dtype_stability():
    out = _rolling_hash_batch(pd.Series(["x", None, ""], dtype=object))
    assert out.dtype == np.int64
