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


def sha2(col: Column, variant: int | str = 256) -> Column:
    """VRL sha2 (sha2.cue). Plain bit-width variants use the JVM builtin;
    the truncated SHA-512/224 and SHA-512/256 variants (the VRL DEFAULT is
    SHA-512/256) have no JVM builtin — Arrow-batched hashlib, like sha3."""
    v = str(variant)
    if v.isdigit():
        return F.sha2(col.cast("string"), int(v))
    name = v.lower().replace("sha-", "sha").replace("/", "_")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _h(s: pd.Series) -> pd.Series:
        import hashlib

        return s.map(
            lambda x: None
            if x is None
            else hashlib.new(name, str(x).encode()).hexdigest()
        )

    return _h(col.cast("string"))


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


def encrypt(col: Column, key: str, mode: str = "AES-256-ECB") -> Column:
    """VRL encrypt (encrypt.cue) via Spark's builtin aes_encrypt — JVM-side.
    ``mode``: AES-{128,192,256}-{ECB,GCM,CBC} (key length must match the
    bit size). GCM/CBC stamp a random IV per call (nondeterministic by
    design — same as the reference); ECB is deterministic."""
    spark_mode = mode.rsplit("-", 1)[-1]
    return F.aes_encrypt(
        col.cast("binary"), F.lit(key).cast("binary"), F.lit(spark_mode)
    )


def decrypt(col: Column, key: str, mode: str = "AES-256-ECB") -> Column:
    """VRL decrypt via aes_decrypt (binary out — cast to string upstream)."""
    spark_mode = mode.rsplit("-", 1)[-1]
    return F.aes_decrypt(
        col, F.lit(key).cast("binary"), F.lit(spark_mode)
    )


def encode_punycode(col: Column) -> Column:
    """VRL encode_punycode: IDNA-encode a (possibly unicode) domain —
    stdlib idna codec inside an Arrow-batched UDF."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _enc(s: pd.Series) -> pd.Series:
        def go(v):
            if v is None:
                return None
            try:
                return v.encode("idna").decode("ascii")
            except UnicodeError:
                return None

        return s.map(go)

    return _enc(col)


def decode_punycode(col: Column) -> Column:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        def go(v):
            if v is None:
                return None
            try:
                return v.encode("ascii").decode("idna")
            except UnicodeError:
                return None

        return s.map(go)

    return _dec(col)


def decode_mime_q(col: Column) -> Column:
    """VRL decode_mime_q: RFC 2047 encoded-words (=?utf-8?Q?...?= /
    ?B?...) → decoded text, via the stdlib email.header machinery."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        from email.header import decode_header

        def go(v):
            if v is None:
                return None
            out = []
            for frag, enc in decode_header(v):
                if isinstance(frag, bytes):
                    out.append(frag.decode(enc or "ascii", errors="replace"))
                else:
                    out.append(frag)
            return "".join(out)

        return s.map(go)

    return _dec(col)


_B62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def uuid_from_friendly_id(col: Column) -> Column:
    """VRL uuid_from_friendly_id: base62 'friendly id' → canonical UUID
    string (the 128-bit integer, hyphen-formatted)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        def go(v):
            if v is None:
                return None
            n = 0
            for ch in v:
                i = _B62.find(ch)
                if i < 0:
                    return None
                n = n * 62 + i
            if n >= 2**128:
                return None
            h = f"{n:032x}"
            return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"

        return s.map(go)

    return _dec(col)


def random_bytes(n: int, seed: Column) -> Column:
    """Deterministic random bytes: counter-mode SHA-256 PRF over ``seed``.

    Parity: VRL ``random_bytes`` (website/cue/reference/remap/functions/
    random_bytes.cue) draws from the OS RNG — acceptable in a single-pass
    stream processor, but wrong in a distributed engine where a retried
    task must reproduce its partition's output (the same reason skew salts
    here are data-derived, operators/skew.py). The engine variant therefore
    REQUIRES an explicit per-row seed column; same seed → same bytes on
    every executor, every retry, every engine (oracle-reproducible).

    ``n`` ≤ 1024. Output is BINARY; use ``F.hex`` for a portable digest.
    """
    if not 0 < n <= 1024:
        raise ValueError("random_bytes: n must be in 1..1024")
    blocks = [
        F.sha2(F.concat(seed.cast("string"), F.lit(f":{i}")), 256)
        for i in range((n * 2 + 63) // 64)
    ]
    return F.unhex(F.substring(F.concat(*blocks), 1, n * 2))
