"""Charset encode/decode (reference charsequence.h:123-544, SURVEY §2.7).

The reference converts between 9 charsets (ascii, utf8, utf16/le/be,
utf32/le/be, latin1) with U+FFFD replacement on invalid input. Spark's
built-in encode/decode covers US-ASCII, ISO-8859-1, UTF-8, UTF-16/BE/LE;
UTF-32 variants are supplied here as Arrow-batched pandas UDFs (the only
Python-side kernels in the string layer).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# charset name → (spark builtin name | None)
BUILTIN = {
    "ascii": "US-ASCII",
    "latin1": "ISO-8859-1",
    "utf8": "UTF-8",
    "utf16": "UTF-16",
    "utf16le": "UTF-16LE",
    "utf16be": "UTF-16BE",
}
UTF32 = {"utf32": "utf-32", "utf32le": "utf-32-le", "utf32be": "utf-32-be"}


@F.pandas_udf(T.BinaryType())
def _encode_utf32(s: pd.Series) -> pd.Series:
    return s.map(lambda x: None if x is None else x.encode("utf-32-le"))


@F.pandas_udf(T.BinaryType())
def _encode_utf32be(s: pd.Series) -> pd.Series:
    return s.map(lambda x: None if x is None else x.encode("utf-32-be"))


@F.pandas_udf(T.StringType())
def _decode_utf32(b: pd.Series) -> pd.Series:
    # U+FFFD on invalid input — the reference's replacement policy
    # (charsequence.h:265-495)
    return b.map(
        lambda x: None if x is None else bytes(x).decode("utf-32-le", errors="replace")
    )


@F.pandas_udf(T.StringType())
def _decode_utf32be(b: pd.Series) -> pd.Series:
    return b.map(
        lambda x: None if x is None else bytes(x).decode("utf-32-be", errors="replace")
    )


def encode_charset(col: Column, charset: str) -> Column:
    """String → bytes in the named charset (reference getBytes/encode)."""
    cs = charset.lower().replace("-", "").replace("_", "")
    if cs in BUILTIN:
        return F.encode(col, BUILTIN[cs])
    if cs in ("utf32", "utf32le"):
        return _encode_utf32(col)
    if cs == "utf32be":
        return _encode_utf32be(col)
    raise ValueError(f"unsupported charset {charset!r}")


def decode_charset(col: Column, charset: str) -> Column:
    """Bytes → string from the named charset, U+FFFD on invalid input."""
    cs = charset.lower().replace("-", "").replace("_", "")
    if cs in BUILTIN:
        return F.decode(col, BUILTIN[cs])
    if cs in ("utf32", "utf32le"):
        return _decode_utf32(col)
    if cs == "utf32be":
        return _decode_utf32be(col)
    raise ValueError(f"unsupported charset {charset!r}")


def convert_charset(col: Column, src: str, dst: str) -> Column:
    """Transcode bytes src → dst (reference convert, charsequence.h:497-544)."""
    return encode_charset(decode_charset(col, src), dst)
