"""Host-exact PostgreSQL `numeric` arithmetic over Decimal.

The device path carries numeric as (mant int64, exp int32) lanes with the
reference's representable window (opencl_numeric.h: 57-bit mantissa, 6-bit
exponent); everything outside that window — and every finalization step
(division for avg, sqrt for stddev) — runs here, host-exact, mirroring how the
reference finishes aggregates with pgstrom.*_final SQL functions on the CPU
(pg_strom--1.0.sql:229-401, gpupreagg.c:4431-4773).

PostgreSQL numeric results carry a *display scale* (dscale) chosen by the
operation (numeric.c in PG; rules reimplemented here from its documented
behavior):
  add/sub : dscale = max(d1, d2)
  mul     : dscale = d1 + d2 (capped), exact product
  div     : rscale via select_div_scale: >= 16 significant digits
  sqrt    : rscale >= 16 significant digits
We replicate these so text output matches PG row-for-row.
"""

from __future__ import annotations

from decimal import Decimal, ROUND_HALF_UP, getcontext, localcontext

NUMERIC_MIN_SIG_DIGITS = 16
NUMERIC_MIN_DISPLAY_SCALE = 0
NUMERIC_MAX_DISPLAY_SCALE = 1000
DEC_DIGITS = 4  # PG stores base-10000 digits; weights are in these units

getcontext().prec = 200


def dscale_of(d: Decimal) -> int:
    """Display scale = digits after the decimal point as PG tracks it."""
    exp = d.as_tuple().exponent
    if not isinstance(exp, int):
        return 0
    return max(0, -exp)


def _weight_base10000(d: Decimal) -> int:
    """PG 'weight': position of the most significant base-10000 digit.
    value ~= digit * 10000^weight for the leading digit."""
    if d == 0:
        return 0
    ad = abs(d)
    # decimal exponent of most significant digit
    msd_exp = ad.adjusted()  # floor(log10(|d|))
    return msd_exp // DEC_DIGITS if msd_exp >= 0 else -((-msd_exp + DEC_DIGITS - 1) // DEC_DIGITS)


def round_to_scale(d: Decimal, scale: int) -> Decimal:
    """PG numeric rounding: half away from zero at the given scale."""
    q = Decimal(1).scaleb(-scale)
    # PG numeric spans up to 131072 digits before the point; size the
    # context to the value instead of failing on huge magnitudes
    need = max(d.adjusted() + scale + 20, 40) if d.is_finite() else 40
    with localcontext() as ctx:
        ctx.prec = min(max(need, ctx.prec), 200_000)
        return d.quantize(q, rounding=ROUND_HALF_UP)


def num_add(a: Decimal, b: Decimal) -> Decimal:
    r = a + b
    return round_to_scale(r, max(dscale_of(a), dscale_of(b)))


def num_sub(a: Decimal, b: Decimal) -> Decimal:
    r = a - b
    return round_to_scale(r, max(dscale_of(a), dscale_of(b)))


def num_mul(a: Decimal, b: Decimal) -> Decimal:
    r = a * b
    # PG mul_var produces exact product; display scale = d1+d2 but never
    # truncates significant digits (exact result keeps its scale)
    return round_to_scale(r, min(dscale_of(a) + dscale_of(b),
                                 NUMERIC_MAX_DISPLAY_SCALE))


def select_div_scale(a: Decimal, b: Decimal) -> int:
    """PG numeric.c select_div_scale reimplementation."""
    w1 = _weight_base10000(a)
    w2 = _weight_base10000(b)
    qweight = w1 - w2 + 1
    rscale = NUMERIC_MIN_SIG_DIGITS - qweight * DEC_DIGITS
    rscale = max(rscale, dscale_of(a))
    rscale = max(rscale, dscale_of(b))
    rscale = max(rscale, NUMERIC_MIN_DISPLAY_SCALE)
    rscale = min(rscale, NUMERIC_MAX_DISPLAY_SCALE)
    return rscale


def num_div(a: Decimal, b: Decimal, rscale: int | None = None) -> Decimal:
    from .errors import SqlError, ERR_DIV_BY_ZERO
    if b == 0:
        raise SqlError("division by zero", ERR_DIV_BY_ZERO)
    if rscale is None:
        rscale = select_div_scale(a, b)
    with localcontext() as ctx:
        ctx.prec = 250
        r = a / b
    return round_to_scale(r, rscale)


def num_mod(a: Decimal, b: Decimal) -> Decimal:
    from .errors import SqlError, ERR_DIV_BY_ZERO
    if b == 0:
        raise SqlError("division by zero", ERR_DIV_BY_ZERO)
    # PG mod: result sign follows dividend; trunc division
    q = (a / b).to_integral_value(rounding="ROUND_DOWN")
    r = a - q * b
    return round_to_scale(r, max(dscale_of(a), dscale_of(b)))


def num_sqrt(a: Decimal) -> Decimal:
    from .errors import SqlError
    if a < 0:
        raise SqlError("cannot take square root of a negative number")
    if a == 0:
        return round_to_scale(Decimal(0), max(dscale_of(a), NUMERIC_MIN_DISPLAY_SCALE))
    # PG sqrt_var rscale selection
    msd_exp = a.adjusted()
    # decimal weight of the sqrt result
    sweight = msd_exp // 2
    rscale = NUMERIC_MIN_SIG_DIGITS - sweight
    rscale = max(rscale, dscale_of(a))
    rscale = max(rscale, NUMERIC_MIN_DISPLAY_SCALE)
    rscale = min(rscale, NUMERIC_MAX_DISPLAY_SCALE)
    with localcontext() as ctx:
        ctx.prec = 250
        r = a.sqrt()
    return round_to_scale(r, rscale)


def num_abs(a: Decimal) -> Decimal:
    return abs(a)


def num_neg(a: Decimal) -> Decimal:
    return -a


def num_cmp(a: Decimal, b: Decimal) -> int:
    if a < b:
        return -1
    if a > b:
        return 1
    return 0


# ---------------------------------------------------------------------------
# text formatting (PG numeric_out): plain notation, dscale fraction digits
# ---------------------------------------------------------------------------

def numeric_out(d: Decimal) -> str:
    if d != d:  # NaN
        return "NaN"
    sign, digits, exp = d.as_tuple()
    if isinstance(exp, str):
        return "NaN"
    s = format(d, "f")
    # Decimal("1E+3") formats as "1000" with 'f'; dscale trailing zeros kept
    return s


# average/stddev finalization helpers used by the aggregate layer ------------

def numeric_avg(sum_: Decimal, count: int) -> Decimal:
    """PG numeric avg = sum / count with select_div_scale."""
    return num_div(sum_, Decimal(count))


def int_avg(sum_: int, count: int) -> Decimal:
    """PG int2/4/8 avg: numeric division of exact integer sum by count
    (int8_avg / numeric_poly_avg semantics)."""
    return num_div(Decimal(sum_), Decimal(count))


def numeric_stddev_internal(count: int, sum_x: Decimal, sum_x2: Decimal,
                            variance: bool, sample: bool) -> Decimal | None:
    """PG numeric_stddev_internal: var = (N*sumX2 - sumX^2) / (N*(N-denom))
    computed with PG's rscale choices (numeric.c)."""
    n = count
    if n == 0 or (sample and n == 1):
        return None
    vN = Decimal(n)
    vNminus1 = vN - 1
    # vsumX2' = N * sumX2 ; vsumX' = sumX * sumX   (exact muls)
    t1 = num_mul(vN, sum_x2)
    t2 = num_mul(sum_x, sum_x)
    numerator = num_sub(t1, t2)
    if numerator < 0:
        numerator = Decimal(0)
    denom = vN * (vNminus1 if sample else vN)
    # PG: div_var(&vsumX2, &vNtimesNminus1, &vtmp, rscale, true) where
    # rscale = select_div_scale-like; then sqrt for stddev
    var = num_div(numerator, denom)
    if variance:
        return var
    return num_sqrt(var)
