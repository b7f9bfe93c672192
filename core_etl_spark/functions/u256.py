"""u256 quantity helpers.

The reference stores every u256 (block difficulty, tx value, transfer
amount) as a string because it overflows i64 (reference
crates/types/src/block.rs:32, transaction.rs:28-36). We keep the same
policy — **strings are the source of truth** — and derive numerics on
demand:

- ``hex_u256_to_decimal``: hex word → DecimalType(38,0). Overflow policy:
  u256 max (~1.16e77) exceeds Decimal(38) (~1e38); values wider than 38
  digits become NULL (Spark's conv/cast overflow semantics), never silently
  truncated. For chain-native token amounts (≤ 2^96 wei-style) Decimal(38)
  is lossless, which covers the reference's CBC20 surface.
- ``dec_u256_to_decimal``: decimal-string → DecimalType(38,0), same policy.
- ``hex_to_long``: narrow hex (≤15 chars) → bigint, exact.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC38 = "decimal(38,0)"


def strip_0x(h: Column) -> Column:
    return F.regexp_replace(F.lower(h), "^0x", "")


def _valid_hex(clean: Column) -> Column:
    """Non-empty all-hex-digits — the gate for the malformed→NULL policy.
    ``conv`` alone does NOT enforce it: ``conv('zz', 16, 10)`` returns
    ``'0'`` (r16 review, verified live), so without this guard garbage
    hex silently became ZERO — counted into every downstream aggregate
    instead of excluded like the module promises."""
    return clean.rlike("^[0-9a-fA-F]+$")


def hex_to_long(h: Column) -> Column:
    """Exact hex→bigint for words up to 15 hex chars (60 bits); wider
    words go NULL (try_cast) instead of killing the stage under ANSI —
    one dirty 16-char word otherwise raised CAST_INVALID_INPUT from
    conv's unsigned 2^63.. output (r15 review, module NULL policy).
    Non-hex / empty input → NULL, never 0 (r16 review)."""
    clean = strip_0x(h)
    return F.when(_valid_hex(clean), F.conv(clean, 16, 10).try_cast("long"))


def hex_u256_to_decimal(h: Column) -> Column:
    """Hex word → Decimal(38,0). ``conv`` returns the base-10 digits as a
    string (unsigned 64-bit wraparound applies above 2^64 — so for wide
    words we parse in two 16-char limbs and recombine in decimal space).
    Non-hex / empty input → NULL, never 0 (r16 review)."""
    clean = strip_0x(h)
    sig = F.regexp_replace(clean, "^0+", "")  # significant digits
    # lpad TRUNCATES longer inputs, so guard >128-bit first (policy: NULL).
    x = F.lpad(sig, 32, "0")
    hi = F.conv(F.substring(x, 1, 16), 16, 10).cast(DEC38)
    lo = F.conv(F.substring(x, 17, 16), 16, 10).cast(DEC38)
    two64 = F.lit(str(2**64)).cast(DEC38)  # 2^64 exceeds py4j's long literal
    # try_*: 128-bit values above Decimal(38) max go NULL under ANSI mode
    # instead of raising, matching the documented policy.
    combined = F.try_add(F.try_multiply(hi, two64), lo)
    return F.when(
        _valid_hex(clean) & (F.length(sig) <= 32), combined
    ).otherwise(F.lit(None).cast(DEC38))


def dec_u256_to_decimal(s: Column) -> Column:
    """Decimal-string u256 → Decimal(38,0); NULL when > 38 digits or
    non-numeric — try_cast, because ANSI's plain cast RAISES on both
    (verified live: 2^256-1 killed the job; the docstring always
    promised NULL — r15 review)."""
    return s.try_cast(DEC38)
