"""Cross-engine deterministic hashing/tokenization primitives.

Every dedup/fingerprint operator needs a hash function that produces the
SAME value in Spark and in the DuckDB oracle. Neither engine's native
`hash()` matches the other, but both implement md5 over strings
identically; a 15-hex-digit prefix parsed as an integer gives a uniform
60-bit hash both engines agree on:

  Spark : CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
  DuckDB: ('0x' || substring(md5(x), 1, 15))::BIGINT

Helpers here emit the paired expression snippets (Spark SQL expr string +
DuckDB SQL string) so operators and oracles can never drift apart.
"""

from __future__ import annotations

MAX_LONG = "9223372036854775807"


def spark_md5_int(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def sql_md5_int(expr: str) -> str:
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def spark_shingles(text: str, n: int) -> str:
    """Distinct character n-grams (shingles) of a string column."""
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(length({text}) - {n} + 1, 1)),"
        f" i -> substring({text}, i, {n})))"
    )


def sql_shingles(text: str, n: int) -> str:
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({text}) - {n} + 1, 1) + 1),"
        f" i -> substring({text}, i, {n})))"
    )


def spark_tokens(text: str) -> str:
    """Whitespace tokens (non-empty)."""
    return f"regexp_extract_all({text}, '\\\\S+', 0)"


def sql_tokens(text: str) -> str:
    return f"regexp_extract_all({text}, '\\S+')"


def spark_word_shingles(text: str, n: int) -> str:
    """Distinct word n-grams. Preferred over char shingles for corpora with
    a shared vocabulary: a specific n-word sequence is rare, so inverted-
    index joins and LSH buckets stay small while true near-dups (which
    share long word runs) still collide."""
    toks = spark_tokens(text)
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(size({toks}) - {n} + 1, 1)),"
        f" i -> concat_ws(' ', slice({toks}, i, {n}))))"
    )


def spark_word_shingles_from_tokens(toks: str, n: int) -> str:
    """Word n-grams over an already-materialized token-array column.
    Callers should project the token array in its own select first:
    referencing the tokenizer expression inside the shingle lambda would
    re-run the regex once per shingle (Catalyst inlines it into the lambda
    body) — a measured 3× slowdown."""
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(size({toks}) - {n} + 1, 1)),"
        f" i -> concat_ws(' ', slice({toks}, i, {n}))))"
    )


def sql_word_shingles(text: str, n: int) -> str:
    toks = sql_tokens(text)
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n} + 1, 1) + 1),"
        f" i -> array_to_string(({toks})[i : i + {n - 1}], ' ')))"
    )


# Universal-hash minhash signature: one md5 per shingle, then k affine
# hashes h_j(x) = ((2j+1)·x31 + b_j) mod P over the 31-bit residue — the
# standard (a·x+b) mod p scheme. All arithmetic stays < 2^63 (no overflow:
# Spark longs would wrap silently, DuckDB would error — neither happens).
_P31 = 2147483647  # 2^31 - 1 (Mersenne prime)
_BMUL = 1013904223  # Numerical-Recipes LCG increment, arbitrary mixer


def spark_minhash_sig(shingles: str, k: int) -> str:
    """Whole k-element signature as ONE left-fold over the shingle hashes:
    md5 runs exactly once per shingle (the fold input is referenced once,
    so projection collapse cannot duplicate it into a per-seed loop), and
    each shingle contributes k affine hashes via zip_with."""
    base = f"transform({shingles}, s -> {spark_md5_int('s')} & {_P31})"
    seeds = f"sequence(0, {k - 1})"
    init = f"transform({seeds}, j -> cast({_P31} as bigint))"
    # j must be bigint before multiplying: int*int wraps silently in Spark
    # (ANSI off) while DuckDB promotes — the engines would diverge.
    return (
        f"aggregate({base}, {init}, (acc, h) -> zip_with(acc, {seeds},"
        f" (m, j) -> least(m, ((2*j + 1) * h"
        f" + (cast(j as bigint) * {_BMUL}) % {_P31}) % {_P31})))"
    )


def sql_minhash_sig(shingles: str, k: int) -> str:
    """DuckDB twin — same values via the per-seed nested form (the oracle
    runs at small SF where the k× hash evaluation is irrelevant)."""
    base = f"list_transform({shingles}, s -> {sql_md5_int('s')} & {_P31})"
    return (
        f"list_transform(range(0, {k}), j ->"
        f" list_aggregate(list_transform({base},"
        f" h -> ((2*j + 1) * h + (j * {_BMUL}) % {_P31}) % {_P31}), 'min'))"
    )
