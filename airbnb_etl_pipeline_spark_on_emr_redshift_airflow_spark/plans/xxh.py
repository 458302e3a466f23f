"""Spark-compatible xxHash64 as generated DuckDB SQL.

Every deterministic sampler/grouper in the engine keys on Spark's
``F.xxhash64`` (catalyst ``XxHash64``, seed 42 folded left-to-right
over the fields — for fixed-width fields each fold is the XXH64
short-input path: ``hashInt`` for 4-byte values, ``hashLong`` for
8-byte ones, then the avalanche ``fmix``). Those are closed-form
chains of ~20 64-bit multiply / rotate / xor steps, so DuckDB can
replay them BIT-EXACTLY with HUGEINT mod-2^64 arithmetic:

- multiplications split the constant into 32-bit halves so no
  intermediate exceeds HUGEINT range (x·c mod 2^64 =
  (x·c_lo + ((x·c_hi) mod 2^32)·2^32) mod 2^64 for x < 2^64);
- rotations become (x·2^r mod 2^64) + x // 2^(64−r) (the two bit
  ranges are disjoint, so + is |);
- xors round-trip through UBIGINT (DuckDB's ``xor`` is not defined
  on HUGEINT);
- the chain is emitted as LINEAR step columns (one nested SELECT per
  step) — naive expression substitution doubles the text per step
  and explodes exponentially.

This removes the one blocker that kept the hash-seeded sampling /
packing queries rows-only: the oracle can now recompute the exact
keep-sets and group assignments Spark produces, instead of trusting
self-certification. Verified bit-exact against ``F.xxhash64`` for
positive/negative/large longs in ``tests/test_xxh_oracle.py``.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 1 << 64
_M32 = 1 << 32


def _mulc(x: str, c: int) -> str:
    ch, cl = divmod(c, _M32)
    return f"(({x} * {cl} + (({x} * {ch}) % {_M32}) * {_M32}) % {_M64})"


def _xor(a: str, b: str) -> str:
    return (
        f"CAST(xor(CAST({a} AS UBIGINT), CAST({b} AS UBIGINT)) "
        f"AS HUGEINT)"
    )


def _rotl(x: str, r: int) -> str:
    return f"((({x} * {1 << r}) % {_M64}) + ({x} // {1 << (64 - r)}))"


class _Chain:
    """Accumulates named step columns so the generated SQL grows
    linearly with the number of hash operations."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.steps: list[tuple[str, str]] = []

    def emit(self, expr: str) -> str:
        name = f"{self.prefix}{len(self.steps)}"
        self.steps.append((name, expr))
        return name

    def fmix(self, h: str) -> str:
        h = self.emit(_xor(h, f"({h} // {1 << 33})"))
        h = self.emit(_mulc(h, _P2))
        h = self.emit(_xor(h, f"({h} // {1 << 29})"))
        h = self.emit(_mulc(h, _P3))
        h = self.emit(_xor(h, f"({h} // {1 << 32})"))
        return h

    def hash_int(self, i_expr: str, seed_expr: str) -> str:
        """XXH64.hashInt — 4-byte fields promote unsigned."""
        iu = self.emit(
            f"(CASE WHEN {i_expr} < 0 THEN CAST({i_expr} AS HUGEINT) "
            f"+ {_M32} ELSE CAST({i_expr} AS HUGEINT) END)"
        )
        h = self.emit(f"(({seed_expr} + {(_P5 + 4) % _M64}) % {_M64})")
        h = self.emit(_xor(h, _mulc(iu, _P1)))
        r = self.emit(_rotl(h, 23))
        h = self.emit(f"(({_mulc(r, _P2)} + {_P3}) % {_M64})")
        return self.fmix(h)

    def hash_long(self, l_expr: str, seed_expr: str) -> str:
        """XXH64.hashLong — 8-byte fields, two's-complement domain."""
        lu = self.emit(
            f"(CASE WHEN {l_expr} < 0 THEN CAST({l_expr} AS HUGEINT) "
            f"+ {_M64} ELSE CAST({l_expr} AS HUGEINT) END)"
        )
        k = self.emit(_mulc(lu, _P2))
        k = self.emit(_rotl(k, 31))
        k = self.emit(_mulc(k, _P1))
        h = self.emit(f"(({seed_expr} + {(_P5 + 8) % _M64}) % {_M64})")
        h = self.emit(_xor(h, k))
        r = self.emit(_rotl(h, 27))
        h = self.emit(f"(({_mulc(r, _P1)} + {_P4}) % {_M64})")
        return self.fmix(h)

    def to_signed(self, u: str) -> str:
        return self.emit(
            f"(CASE WHEN {u} >= {1 << 63} THEN CAST({u} - {_M64} "
            f"AS BIGINT) ELSE CAST({u} AS BIGINT) END)"
        )


def xxhash64_cols_sql(
    base_sql: str,
    hashes: list[tuple[int, str, str]],
    keep_cols: list[str],
) -> str:
    """SQL computing, over ``base_sql``'s rows, one signed-BIGINT
    column per ``(int_literal_seed_field, long_col, out_name)`` triple
    — each equal to Spark's ``xxhash64(lit(int), col(long))`` (session
    seed 42) — projecting ``keep_cols`` plus the hash columns."""
    q = f"({base_sql})"
    outs: list[tuple[str, str]] = []
    for i, (lit, col, out) in enumerate(hashes):
        ch = _Chain(f"__x{i}_")
        s1 = ch.hash_int(str(lit), "CAST(42 AS HUGEINT)")
        final = ch.to_signed(ch.hash_long(col, s1))
        for name, expr in ch.steps:
            q = f"(SELECT *, {expr} AS {name} FROM {q})"
        outs.append((out, final))
    proj = ", ".join(
        keep_cols + [f"{step} AS {out}" for out, step in outs]
    )
    return f"SELECT {proj} FROM {q}"


def pmod_sql(expr: str, m: int) -> str:
    """Spark ``pmod`` for signed BIGINT (DuckDB % keeps the dividend
    sign, same as Spark %, so the classic wrap fixes negatives)."""
    return f"((({expr}) % {m} + {m}) % {m})"
