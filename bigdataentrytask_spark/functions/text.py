"""Portable text primitives: every helper has a Spark Column form and a
DuckDB SQL-fragment twin computing bit-identical results, so the dedup
and text-analysis operators can be differentially tested end-to-end.

Hashing is md5-based (both engines ship md5) — the first 8 hex chars
parsed as an integer give a deterministic 32-bit token hash that is
then reduced mod MERSENNE_P so the minhash congruential transforms
(a*h+b) % p stay inside signed-64 range.

At scale these are all whole-stage-codegen expressions (no Python);
the only data movement any of them imply is the explode() of token
lists, which is linear in corpus token count.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
MERSENNE_P = 2_147_483_647  # 2^31 - 1; keeps a*h + b < 2^62

# MinHash family: K deterministic affine transforms with constants from
# a fixed-seed RNG (seed chosen once; values are data, not randomness).
NUM_HASHES = 32
_rng = random.Random(20240813)
MINHASH_A = [_rng.randrange(1, MERSENNE_P) for _ in range(NUM_HASHES)]
MINHASH_B = [_rng.randrange(0, MERSENNE_P) for _ in range(NUM_HASHES)]
LSH_BANDS = 8  # 8 bands x 4 rows


def tokens(col: Column | str) -> Column:
    """Lowercase alnum tokens; empties filtered."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


def sql_tokens(expr: str) -> str:
    """DuckDB twin of tokens()."""
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_RE}'),"
        " x -> x <> '')"
    )


def token_hash(col: Column | str) -> Column:
    """Token -> integer in [0, MERSENNE_P): md5 hex prefix mod p."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % MERSENNE_P
    )


def sql_token_hash(expr: str) -> str:
    """DuckDB twin of token_hash()."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT % {MERSENNE_P})"


def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact-dup fingerprints: lowercase, whitespace
    collapsed, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def sql_normalize_text(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"
