"""ISCC-style unit codec — the identity feature's string form.

Implements the public ISO 24138 header scheme (as documented by the
iscc-core spec and mirrored in the reference's models,
iscc_search/models.py:85-131: varnibble header <maintype, subtype, version,
length> + body, base32 upper no-padding, "ISCC:" prefix) for the one unit
family this engine produces: CONTENT_TEXT_V0 64-bit simhashes.

This is a from-scratch minimal codec for 0-7 nibble values (all we need);
it round-trips and is covered by literal tests.  It exists so downstream
users get the reference's canonical string identity for each document:
``ISCC:EAA...`` <-> int64 simhash.
"""

from __future__ import annotations

import base64

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MT_CONTENT = 2
ST_TEXT = 0
VERSION = 0
LEN_64 = 1  # length field: (bits / 32) - 1


def _header(maintype: int, subtype: int, version: int, length: int) -> bytes:
    """2-byte header for nibble values 0-7 (varnibble without extension)."""
    for v in (maintype, subtype, version, length):
        if not 0 <= v <= 7:
            raise ValueError("only nibble values 0-7 supported")
    return bytes([(maintype << 4) | subtype, (version << 4) | length])


def encode_unit(body: bytes, maintype: int = MT_CONTENT, subtype: int = ST_TEXT,
                version: int = VERSION, length: int | None = None) -> str:
    if length is None:
        length = (len(body) * 8) // 32 - 1
    raw = _header(maintype, subtype, version, length) + body
    b32 = base64.b32encode(raw).decode("ascii").rstrip("=")
    return "ISCC:" + b32


def decode_unit(code: str) -> tuple[int, int, int, int, bytes]:
    """-> (maintype, subtype, version, length, body)."""
    if code.startswith("ISCC:"):
        code = code[5:]
    pad = "=" * (-len(code) % 8)
    raw = base64.b32decode(code + pad)
    h0, h1 = raw[0], raw[1]
    return h0 >> 4, h0 & 0xF, h1 >> 4, h1 & 0xF, raw[2:]


def simhash_to_code(simhash: int) -> str:
    """int64 simhash -> canonical CONTENT_TEXT_V0 64-bit ISCC unit string."""
    body = (simhash & (2**64 - 1)).to_bytes(8, "big")
    return encode_unit(body)


def code_to_simhash(code: str) -> int:
    mt, st, ver, ln, body = decode_unit(code)
    if (mt, st, ver, ln) != (MT_CONTENT, ST_TEXT, VERSION, LEN_64):
        raise ValueError(f"not a CONTENT_TEXT_V0 64-bit unit: {code}")
    return int.from_bytes(body, "big", signed=False) - (
        1 << 64 if body[0] & 0x80 else 0
    )


@F.pandas_udf(T.StringType())
def simhash_code_udf(simhash: pd.Series) -> pd.Series:
    return simhash.map(lambda v: simhash_to_code(int(v)))


@F.pandas_udf(T.LongType())
def code_simhash_udf(code: pd.Series) -> pd.Series:
    return code.map(code_to_simhash)
