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


def xxhash64_long_u_sql(
    base_sql: str,
    hashes: list[tuple[str, str]],
    keep_cols: list[str],
) -> str:
    """SQL computing, over ``base_sql``'s rows, one UNSIGNED-HUGEINT
    column per ``(long_col, out_name)`` pair — each equal to the
    2^64-domain bit pattern of Spark's ``xxhash64(col(long))``
    (session seed 42, single 8-byte field). The unsigned form is what
    bucket/rho bit arithmetic wants (``u % 2^p`` = the signed value's
    low bits, ``u // 2^p`` = shiftrightunsigned)."""
    q = f"({base_sql})"
    outs: list[tuple[str, str]] = []
    for i, (col, out) in enumerate(hashes):
        ch = _Chain(f"__xl{i}_")
        final = ch.hash_long(col, "CAST(42 AS HUGEINT)")
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


# ----- variable-length (string) XXH64 ------------------------------------
#
# Spark hashes StringType as the raw UTF-8 bytes
# (XXH64.hashUnsafeBytes): 4 parallel lanes over 32-byte blocks when
# len >= 32, then the remaining 8-byte words, one optional 4-byte
# word, then single bytes, then the fmix avalanche. Every multiply is
# by a constant prime, so the same 32-bit-split trick keeps all
# intermediates inside HUGEINT; the variable-length folds run as
# list_reduce over HUGEINT lists with the seed prepended (DuckDB's
# list_reduce uses the first element as the initial accumulator and
# errors on empty lists — prepending makes zero-iteration folds
# return the seed, which is exactly the algorithm's semantics).

_HEXD = "0123456789ABCDEF"


def _byte(hx: str, j: str) -> str:
    """Byte ``j`` (0-based expr) of the hex string column ``hx``."""
    hi = f"(strpos('{_HEXD}', substr({hx}, 2*({j})+1, 1)) - 1)"
    lo = f"(strpos('{_HEXD}', substr({hx}, 2*({j})+2, 1)) - 1)"
    return f"CAST({hi} * 16 + {lo} AS HUGEINT)"


def _word8(bys: str, o: str) -> str:
    """Little-endian 8-byte word at 0-based offset ``o`` of the
    HUGEINT byte list ``bys`` (list indexes must be BIGINT)."""
    return "(" + " + ".join(
        f"{bys}[CAST(({o})+{k + 1} AS BIGINT)] * {1 << (8 * k)}"
        for k in range(8)
    ) + ")"


def _word4(bys: str, o: str) -> str:
    return "(" + " + ".join(
        f"{bys}[CAST(({o})+{k + 1} AS BIGINT)] * {1 << (8 * k)}"
        for k in range(4)
    ) + ")"


def _lane_fold(v: str, w: str) -> str:
    """One XXH64 lane/word round: rotl31((v + w*P2) mod 2^64) * P1."""
    s = f"(({v} + {_mulc(w, _P2)}) % {_M64})"
    return _mulc(_rotl(s, 31), _P1)


class _StrChain(_Chain):
    def hash_bytes(self, str_expr: str, seed) -> str:
        """XXH64 over the UTF-8 bytes of ``str_expr`` — Spark's
        StringType fold step. ``seed`` is an int constant or a step
        column carrying the previous field's hash (< 2^64)."""
        const_seed = isinstance(seed, int)
        hx = self.emit(f"hex(encode({str_expr}))")
        n = self.emit(
            f"CAST(octet_length(encode({str_expr})) AS HUGEINT)"
        )
        bys = self.emit(
            f"list_transform(range(0, CAST({n} AS BIGINT)), "
            f"j -> {_byte(hx, 'j')})"
        )
        nb = self.emit(f"({n} // 32)")
        if const_seed:
            inits = [
                str((seed + _P1 + _P2) % _M64),
                str((seed + _P2) % _M64),
                str(seed % _M64),
                str((seed - _P1) % _M64),
            ]
        else:
            inits = [
                self.emit(f"(({seed} + {(_P1 + _P2) % _M64}) % {_M64})"),
                self.emit(f"(({seed} + {_P2}) % {_M64})"),
                seed,
                self.emit(f"(({seed} + {_M64 - _P1}) % {_M64})"),
            ]
        lanes = []
        for li, init in enumerate(inits):
            words = (
                f"list_transform(range(0, CAST({nb} AS BIGINT)), "
                f"b -> {_word8(bys, f'32*b + {8 * li}')})"
            )
            lanes.append(self.emit(
                f"list_reduce(list_prepend(CAST({init} AS HUGEINT), "
                f"{words}), (a, w) -> {_lane_fold('a', 'w')})"
            ))
        merged = f"(({_rotl(lanes[0], 1)} + {_rotl(lanes[1], 7)} + " \
                 f"{_rotl(lanes[2], 12)} + {_rotl(lanes[3], 18)}) % {_M64})"
        hm = self.emit(merged)
        for v in lanes:
            k1 = _mulc(_rotl(f"{_mulc(v, _P2)}", 31), _P1)
            hm = self.emit(
                f"(({_mulc(_xor(hm, k1), _P1)} + {_P4}) % {_M64})"
            )
        h_small = (
            str((seed + _P5) % _M64) if const_seed
            else self.emit(f"(({seed} + {_P5}) % {_M64})")
        )
        h = self.emit(
            f"(CASE WHEN {n} >= 32 THEN {hm} ELSE {h_small} END)"
        )
        h = self.emit(f"(({h} + {n}) % {_M64})")
        # remaining 8-byte words after the 32-byte blocks
        off0 = f"(32 * {nb})"
        n8 = self.emit(f"(({n} - {off0}) // 8)")
        words8 = (
            f"list_transform(range(0, CAST({n8} AS BIGINT)), "
            f"k -> {_word8(bys, f'{off0} + 8*k')})"
        )
        step8 = (
            f"(({_mulc(_rotl(_xor('a', _mulc(_rotl(_mulc('w', _P2), 31), _P1)), 27), _P1)}"
            f" + {_P4}) % {_M64})"
        )
        h = self.emit(
            f"list_reduce(list_prepend({h}, {words8}), (a, w) -> {step8})"
        )
        # optional 4-byte word
        off4 = f"({off0} + 8 * {n8})"
        h4 = (
            f"(({_mulc(_rotl(_xor(h, _mulc(_word4(bys, off4), _P1)), 23), _P2)}"
            f" + {_P3}) % {_M64})"
        )
        h = self.emit(
            f"(CASE WHEN {n} - {off4} >= 4 THEN {h4} ELSE {h} END)"
        )
        offb = f"({off4} + CASE WHEN {n} - {off4} >= 4 THEN 4 ELSE 0 END)"
        tail = (
            f"list_transform(range(CAST({offb} AS BIGINT), "
            f"CAST({n} AS BIGINT)), j -> {bys}[CAST(j+1 AS BIGINT)])"
        )
        stepb = _mulc(_rotl(_xor("a", _mulc("w", _P5)), 11), _P1)
        h = self.emit(
            f"list_reduce(list_prepend({h}, {tail}), (a, w) -> {stepb})"
        )
        return self.fmix(h)


def xxhash64_str_sql(
    base_sql: str, str_col: str, out_name: str, prefix: str = "__s"
) -> str:
    """SQL adding ``out_name`` = Spark's ``xxhash64(col(str_col))``
    (StringType field, session seed 42) to ``base_sql``'s rows."""
    ch = _StrChain(prefix)
    final = ch.to_signed(ch.hash_bytes(str_col, 42))
    q = f"({base_sql})"
    for name, expr in ch.steps:
        q = f"(SELECT *, {expr} AS {name} FROM {q})"
    drop = ", ".join(n for n, _ in ch.steps if n != final)
    return (
        f"SELECT * EXCLUDE ({drop}, {final}) , {final} AS {out_name} "
        f"FROM {q}"
    )


def xxhash64_chain_sql(
    base_sql: str,
    fields: list[tuple[str, str]],
    out_name: str,
    prefix: str = "__c",
) -> str:
    """SQL adding ``out_name`` = Spark's ``xxhash64(<fields...>)``
    (session seed 42, fields folded left to right) to ``base_sql``'s
    rows. Each field is ``(kind, expr)`` with kind 'int' (4-byte),
    'long' (8-byte) or 'str' (UTF-8 bytes) — the general form the
    MinHash replays need (per-row int seeds chained into string
    hashes; band hashes over four signature longs)."""
    ch = _StrChain(prefix)
    seed = "CAST(42 AS HUGEINT)"
    for kind, expr in fields:
        if kind == "int":
            seed = ch.hash_int(expr, seed)
        elif kind == "long":
            seed = ch.hash_long(expr, seed)
        elif kind == "str":
            seed = ch.hash_bytes(expr, seed)
        else:
            raise ValueError(f"unknown field kind {kind!r}")
    final = ch.to_signed(seed)
    q = f"({base_sql})"
    for name, expr in ch.steps:
        q = f"(SELECT *, {expr} AS {name} FROM {q})"
    drop = ", ".join(n for n, _ in ch.steps if n != final)
    return (
        f"SELECT * EXCLUDE ({drop}, {final}) , {final} AS {out_name} "
        f"FROM {q}"
    )
