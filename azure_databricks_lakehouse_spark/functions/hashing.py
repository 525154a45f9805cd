"""Cross-engine-deterministic hashing primitives.

Every approximate operator in the engine (MinHash LSH, SimHash,
hyperplane ANN, hash splits) needs hash values that are bit-identical in
Spark and the DuckDB oracle.  The only hash both engines share is
``md5`` over strings, so integers are derived from its hex digits via
``strpos``-style nibble decoding — 1-based, lowercase hex, identical
semantics in both engines.  Each helper ships its SQL twin; call sites
must use the pair, never re-derive one side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def hex_nibble(hex_col: Column, pos: int) -> Column:
    """Value 0..15 of the 1-based ``pos``-th hex digit of ``hex_col``."""
    return F.instr(F.lit(HEX_DIGITS), F.substring(hex_col, pos, 1)) - 1


def hex_nibble_sql(hex_expr: str, pos: int) -> str:
    """ANSI/DuckDB twin of :func:`hex_nibble`."""
    return f"(strpos('{HEX_DIGITS}', substr({hex_expr}, {pos}, 1)) - 1)"


def md5_bucket(col: Column) -> Column:
    """Stable bucket 0..255 from the first md5 byte of ``col``'s string
    form — the deterministic split/sampling primitive (assignment depends
    only on the value: survives reshuffles, re-runs, corpus growth)."""
    h = F.md5(col.cast("string"))
    return hex_nibble(h, 1) * 16 + hex_nibble(h, 2)


def md5_bucket_sql(expr: str) -> str:
    h = f"md5(CAST({expr} AS VARCHAR))"
    return f"({hex_nibble_sql(h, 1)} * 16 + {hex_nibble_sql(h, 2)})"


_POLY_MULT = 31
_POLY_MOD = 1 << 16


def char_codes(col: Column) -> Column:
    """Array of per-character codepoints of ``col`` (Karp-Rabin input)."""
    return F.transform(F.split(col, ""), F.ascii)


def char_codes_sql(expr: str) -> str:
    return f"list_transform(string_split({expr}, ''), c -> ascii(c))"


def poly_u16(codes: Column) -> Column:
    """Karp-Rabin polynomial hash (Horner fold, base 31, mod 2^16) of a
    char-code array slice.  ~10 integer ops per k-gram vs md5's hundreds —
    the *cheap* cross-engine hash for per-position fingerprinting jobs
    where ``md5_u16`` (one digest per k-gram) is 100x the work.  Spark
    folds with init 0 so the first step yields ``codes[0]``; the DuckDB
    twin's ``list_reduce`` seeds with the first element — identical
    sequences, verified digit-for-digit by the oracle gate."""
    return F.aggregate(
        codes, F.lit(0), lambda acc, c: (acc * _POLY_MULT + c) % _POLY_MOD
    )


def poly_u16_sql(list_expr: str) -> str:
    return (
        f"list_reduce({list_expr}, "
        f"(a, c) -> (a * {_POLY_MULT} + c) % {_POLY_MOD})"
    )


def xxh_u64(col: Column) -> Column:
    """Production (Spark-only) sketch hash: ``xxhash64`` is a JVM
    intrinsic non-cryptographic hash — the right choice when no DuckDB
    twin is needed.  Operators that are oracle-compared must use the
    md5/poly primitives above instead."""
    return F.xxhash64(col)


def md5_u16(col: Column) -> Column:
    """16-bit hash (0..65535) from the first four md5 hex digits of
    ``col`` — the per-token/per-k-gram hash for SimHash and winnowing
    fingerprints.  Pure nibble arithmetic: no engine-specific bit
    intrinsics, so Spark and DuckDB agree digit for digit."""
    h = F.md5(col.cast("string"))
    out = F.lit(0)
    for i in range(4):
        out = out + hex_nibble(h, i + 1) * (16 ** (3 - i))
    return out


def md5_u16_sql(expr: str) -> str:
    h = f"md5(CAST({expr} AS VARCHAR))"
    terms = " + ".join(
        f"{hex_nibble_sql(h, i + 1)} * {16 ** (3 - i)}" for i in range(4)
    )
    return f"({terms})"


_U24 = 16**6


def md5_uniform01(col: Column, seed: int) -> Column:
    """Deterministic uniform strictly inside (0, 1): ``(raw + 0.5) /
    2^24`` from the first six md5 nibbles of ``(col, seed)``.  The
    half-step offset keeps both endpoints out, so downstream
    ``-ln(-ln(u))`` (Gumbel keys for weighted sampling) can never hit
    ±inf.  ~16.7M distinct levels; same value for the same (id, seed)
    in every engine, every partitioning, every rerun."""
    h = F.md5(F.concat(col.cast("string"), F.lit(f"#{seed}")))
    raw = F.lit(0)
    for i in range(1, 7):
        raw = raw * 16 + hex_nibble(h, i)
    return (raw.cast("double") + F.lit(0.5)) / F.lit(float(_U24))


def md5_uniform01_sql(expr: str, seed: int) -> str:
    h = f"md5(CAST({expr} AS VARCHAR) || '#{seed}')"
    raw = "0"
    for i in range(1, 7):
        raw = f"({raw} * 16 + {hex_nibble_sql(h, i)})"
    return f"((CAST({raw} AS DOUBLE) + 0.5) / {float(_U24)})"
