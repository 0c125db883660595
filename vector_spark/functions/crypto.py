"""VRL crypto/encode functions → Column builders.

Parity: md5, sha1, sha2, sha3(→ sha2 fallback noted), hmac, seahash
(→ xxhash64, semantic stand-in — deterministic 64-bit hash; family differs,
see SURVEY.md §7 hard-part 1), encode_/decode_base64, encode_base16,
encode_json, encode_logfmt, encode_key_value.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def md5(col: Column) -> Column:
    return F.md5(col.cast("string"))


def sha1(col: Column) -> Column:
    return F.sha1(col.cast("string"))


def sha2(col: Column, variant: int = 256) -> Column:
    return F.sha2(col.cast("string"), variant)


def hmac_sha256(col: Column, key: str) -> Column:
    """HMAC-SHA256 over strings. No Spark built-in → single narrow pandas UDF
    (vectorized; only use off the hot path)."""
    import hashlib
    import hmac as _hmac

    kb = key.encode()

    @pandas_udf("string")
    def _h(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else _hmac.new(kb, v.encode(), hashlib.sha256).hexdigest()
        )

    return _h(col.cast("string"))


def seahash(col: Column) -> Column:
    """Deterministic 64-bit content hash (reference uses seahash; we use
    xxhash64 — same contract: stable across runs/nodes, uniform)."""
    return F.xxhash64(col)


def portable_hash(col: Column, mod: int = 1_000_003) -> Column:
    """Engine-portable deterministic string hash: positional weighted char
    codes, ``sum(ord(c_i) * i * 2654435761 % mod)``. Weaker than xxhash64
    (use seahash/xxhash64 in production paths) but reproducible in ANY
    engine with basic list ops — the correctness oracle recomputes it
    exactly, which the JVM-internal hash families cannot offer."""
    i = F.sequence(F.lit(1), F.length(col))
    return F.aggregate(
        F.transform(
            i,
            lambda p: (F.ascii(F.substring(col, p, 1)) * p * 2654435761) % mod,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def encode_base64(col: Column) -> Column:
    return F.base64(col.cast("binary"))


def decode_base64(col: Column) -> Column:
    return F.unbase64(col).cast("string")


def encode_base16(col: Column) -> Column:
    return F.lower(F.hex(col.cast("binary")))


def decode_base16(col: Column) -> Column:
    return F.unhex(col).cast("string")


def encode_json(col: Column) -> Column:
    return F.to_json(col)


def encode_key_value(col: Column, pair_sep: str = " ", kv_sep: str = "=") -> Column:
    """encode_key_value / encode_logfmt over a map<string,string> column."""
    entries = F.transform(
        F.map_entries(col),
        lambda e: F.concat(e["key"], F.lit(kv_sep), e["value"]),
    )
    return F.array_join(entries, pair_sep)


encode_logfmt = encode_key_value


def sha3(col: Column, variant: int = 256) -> Column:
    """VRL sha3 (sha3.cue): Keccak SHA-3 hex digest. No JVM builtin, so an
    Arrow-batched pandas UDF over hashlib's native sha3 (stdlib)."""
    import hashlib

    fn = getattr(hashlib, f"sha3_{variant}")  # fail fast on bad variant

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _h(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else fn(v if isinstance(v, bytes) else str(v).encode()).hexdigest()
        )

    return _h(col)
