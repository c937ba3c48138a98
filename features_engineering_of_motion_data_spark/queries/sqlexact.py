"""Correctly-rounded integer→double casts for the DuckDB oracles.

DuckDB's HUGEINT→DOUBLE (and DECIMAL→DOUBLE) cast is NOT correctly rounded:
it recombines the value from pieces with more than one floating-point
rounding, so integers above 2⁵³ can land 1 ulp away from the nearest double
(e.g. 121570657319251696946 → 1.215706573192517e+20 instead of the correct
1.2157065731925169e+20 — found by the q48 sf0.01 contract run; ~1.7 % of
random 54–126-bit integers are affected). Spark's decimal(38,0)→double IS
correctly rounded (Java BigInteger.doubleValue; fuzz-verified 0/20000
mismatches), so every oracle that casts a possibly->2⁵³ exact integer to
double must pin the DuckDB side to correct rounding or the value-hash
comparison diverges by 1 ulp on unlucky groups.

:func:`split_dbl` does that with exact pieces: ``hi = v // 2⁴⁸`` and
``lo = v % 2⁴⁸`` are each below 2⁵³ (for |v| < 2¹⁰¹ — far above every
oracle's magnitude), so both casts are exact, ``hi·2⁴⁸`` is exact (a power
of two only shifts the exponent), and the single final ``+`` rounds once —
by definition the nearest double to v. Fuzz-verified 0/20000 mismatches vs
Python's correctly-rounded ``float(int)`` over ±2¹⁰⁰. The operand MUST be
HUGEINT (``//``/``%`` on DECIMAL produce scaled decimals and re-round), so
the helper casts first; DECIMAL(38,0) always fits HUGEINT.
"""

from __future__ import annotations

_TWO48 = 281474976710656  # 2**48


def split_dbl(expr: str) -> str:
    """SQL for a correctly-rounded DOUBLE cast of an exact-integer ``expr``
    (any type coercible to HUGEINT; |value| must be < 2¹⁰¹)."""
    h = f"CAST(({expr}) AS HUGEINT)"
    return (
        f"(CAST(({h}) // {_TWO48} AS DOUBLE) * {_TWO48}.0"
        f" + CAST(({h}) % {_TWO48} AS DOUBLE))"
    )
