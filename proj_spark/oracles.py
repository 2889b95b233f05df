"""DuckDB-SQL mirrors of the numpy coordinate kernels.

The driver's correctness gate runs every ``__spark_entry__.queries()`` entry
against an ANSI-SQL oracle in DuckDB. For closed-form kernels that is easy;
for the series kernels (Poder/Engsager tmerc, cart/helmert pipelines) this
module GENERATES the SQL by unrolling the exact numpy evaluation order —
same Clenshaw recurrences, same association, same constants (inlined via
``repr`` so they round-trip bit-exactly). The only cross-engine deltas left
are libm-vs-numpy transcendental ulps (~1e-16 relative), which the query
layer absorbs by rounding outputs at centimetre granularity.

Each emitter appends ``(column_name, sql_expression)`` pairs to a list;
``chain_sql`` folds the list into a nested-CTE pipeline (one projection per
column, so expressions stay shallow and strictly ordered).
"""

from __future__ import annotations

from proj_spark.kernels.tmerc import TMercExact


def chain_sql(base_select: str, cols: list[tuple[str, str]], final_select: str) -> str:
    """base_select provides the seed columns; each (name, expr) becomes one
    CTE layer ``SELECT *, expr AS name FROM prev``; final_select runs last."""
    parts = [f"c0 AS ({base_select})"]
    for k, (name, expr) in enumerate(cols, 1):
        parts.append(f"c{k} AS (SELECT *, {expr} AS {name} FROM c{k - 1})")
    return "WITH " + ",\n".join(parts) + f"\n{final_select} FROM c{len(cols)}"


def emit_gatg(cols: list, coefs, B: str, cos2B: str, sin2B: str, pfx: str) -> str:
    """Mirror kernels.tmerc._gatg: B + sin2B * clenshaw(coefs, 2B)."""
    cols.append((f"{pfx}tc", f"2.0 * {cos2B}"))
    prev1, prev2 = None, None
    cols.append((f"{pfx}h1_0", repr(coefs[-1])))
    prev1 = f"{pfx}h1_0"
    for k, c in enumerate(coefs[-2::-1], 1):
        h2 = prev2 if prev2 is not None else "0.0"
        cols.append((f"{pfx}h1_{k}", f"-({h2}) + {pfx}tc * {prev1} + {c!r}"))
        prev2, prev1 = prev1, f"{pfx}h1_{k}"
    cols.append((f"{pfx}res", f"{B} + {prev1} * {sin2B}"))
    return f"{pfx}res"


def emit_clen_complex(cols: list, coefs, sin_r: str, cos_r: str,
                      sinh_i: str, cosh_i: str, pfx: str) -> tuple[str, str]:
    """Mirror kernels.tmerc._clen_complex (complex Clenshaw, unrolled)."""
    cols.append((f"{pfx}r", f"2.0 * {cos_r} * {cosh_i}"))
    cols.append((f"{pfx}i", f"-2.0 * {sin_r} * {sinh_i}"))
    r, i = f"{pfx}r", f"{pfx}i"
    hr, hi = repr(coefs[-1]), "0.0"
    hr1 = hi1 = "0.0"
    cols.append((f"{pfx}hr_0", hr))
    cols.append((f"{pfx}hi_0", hi))
    hr, hi = f"{pfx}hr_0", f"{pfx}hi_0"
    for k, c in enumerate(coefs[-2::-1], 1):
        hr2, hi2 = hr1, hi1
        hr1, hi1 = hr, hi
        cols.append((f"{pfx}hr_{k}", f"-({hr2}) + {r} * {hr1} - {i} * {hi1} + {c!r}"))
        cols.append((f"{pfx}hi_{k}", f"-({hi2}) + {i} * {hr1} + {r} * {hi1}"))
        hr, hi = f"{pfx}hr_{k}", f"{pfx}hi_{k}"
    cols.append((f"{pfx}rr", f"{sin_r} * {cosh_i}"))
    cols.append((f"{pfx}ii", f"{cos_r} * {sinh_i}"))
    cols.append((f"{pfx}real", f"{pfx}rr * {hr} - {pfx}ii * {hi}"))
    cols.append((f"{pfx}imag", f"{pfx}rr * {hi} + {pfx}ii * {hr}"))
    return f"{pfx}real", f"{pfx}imag"


def asinh_sql(t: str) -> str:
    """Cancellation-safe asinh (DuckDB lacks the builtin)."""
    return (f"CASE WHEN {t} < 0 THEN -ln(-({t}) + sqrt({t} * {t} + 1.0)) "
            f"ELSE ln({t} + sqrt({t} * {t} + 1.0)) END")


def emit_tmerc_exact_fwd(cols: list, C: TMercExact, lam: str, phi: str,
                         pfx: str = "t") -> tuple[str, str]:
    """Mirror kernels.tmerc.exact_fwd; returns (x, y) column names in units
    of the semi-major axis (the ProjectionStep applies a/x0/y0 outside)."""
    cn0 = emit_gatg(cols, C.cbg, phi, f"cos(2 * {phi})", f"sin(2 * {phi})",
                    f"{pfx}g")
    cols.append((f"{pfx}sin_cn", f"sin({cn0})"))
    cols.append((f"{pfx}cos_cn", f"cos({cn0})"))
    cols.append((f"{pfx}sin_ce", f"sin({lam})"))
    cols.append((f"{pfx}cos_ce", f"cos({lam})"))
    p = pfx
    cols.append((f"{p}ccc", f"{p}cos_cn * {p}cos_ce"))
    cols.append((f"{p}cn1", f"atan2({p}sin_cn, {p}ccc)"))
    cols.append((f"{p}invd",
                 f"1.0 / sqrt({p}sin_cn * {p}sin_cn + {p}ccc * {p}ccc)"))
    cols.append((f"{p}tan_ce", f"{p}sin_ce * {p}cos_cn * {p}invd"))
    cols.append((f"{p}ce0", asinh_sql(f"{p}tan_ce")))
    cols.append((f"{p}two_inv", f"2.0 * {p}invd"))
    cols.append((f"{p}two_inv_sq", f"{p}two_inv * {p}invd"))
    cols.append((f"{p}tmp_r", f"{p}ccc * {p}two_inv_sq"))
    cols.append((f"{p}sin_arg_r", f"{p}sin_cn * {p}tmp_r"))
    cols.append((f"{p}cos_arg_r", f"{p}ccc * {p}tmp_r - 1.0"))
    cols.append((f"{p}sinh_arg_i", f"{p}tan_ce * {p}two_inv"))
    cols.append((f"{p}cosh_arg_i", f"{p}two_inv_sq - 1.0"))
    dcn, dce = emit_clen_complex(
        cols, C.gtu, f"{p}sin_arg_r", f"{p}cos_arg_r",
        f"{p}sinh_arg_i", f"{p}cosh_arg_i", f"{p}c")
    cols.append((f"{p}cn", f"{p}cn1 + {dcn}"))
    cols.append((f"{p}ce", f"{p}ce0 + {dce}"))
    cols.append((f"{p}y", f"{C.Qn!r} * {p}cn + {C.Zb!r}"))
    cols.append((f"{p}x", f"{C.Qn!r} * {p}ce"))
    return f"{p}x", f"{p}y"


def emit_cart_fwd(cols: list, ell, lam: str, phi: str, h: str,
                  pfx: str = "cf") -> tuple[str, str, str]:
    """Mirror kernels.cart.cart_fwd (Hofmann-Wellenhof & Moritz 5-27)."""
    p = pfx
    cols.append((f"{p}sinphi", f"sin({phi})"))
    cols.append((f"{p}cosphi", f"cos({phi})"))
    cols.append((f"{p}N",
                 f"{ell.a!r} / sqrt(1.0 - {ell.es!r} * {p}sinphi * {p}sinphi)"))
    cols.append((f"{p}X", f"({p}N + {h}) * {p}cosphi * cos({lam})"))
    cols.append((f"{p}Y", f"({p}N + {h}) * {p}cosphi * sin({lam})"))
    cols.append((f"{p}Z", f"({p}N * (1.0 - {ell.es!r}) + {h}) * {p}sinphi"))
    return f"{p}X", f"{p}Y", f"{p}Z"


def emit_cart_inv(cols: list, ell, X: str, Y: str, Z: str,
                  pfx: str = "ci") -> tuple[str, str, str]:
    """Mirror kernels.cart.cart_inv main branch (points away from the earth
    axis / poles — callers must guarantee that, as our derived points do)."""
    p = pfx
    cols.append((f"{p}xa", f"{X} * {ell.ra!r}"))
    cols.append((f"{p}ya", f"{Y} * {ell.ra!r}"))
    cols.append((f"{p}za", f"{Z} * {ell.ra!r}"))
    cols.append((f"{p}pa", f"sqrt({p}xa * {p}xa + {p}ya * {p}ya)"))
    ba = 1.0 - ell.f
    cols.append((f"{p}pb", f"{p}pa * {ba!r}"))
    cols.append((f"{p}norm", f"sqrt({p}za * {p}za + {p}pb * {p}pb)"))
    cols.append((f"{p}c", f"{p}pb * (1.0 / {p}norm)"))
    cols.append((f"{p}s", f"{p}za * (1.0 / {p}norm)"))
    cols.append((f"{p}yphi", f"{p}za + {ell.e2s!r} * {ba!r} * {p}s * {p}s * {p}s"))
    cols.append((f"{p}xphi", f"{p}pa - {ell.es!r} * {p}c * {p}c * {p}c"))
    cols.append((f"{p}normphi", f"sqrt({p}yphi * {p}yphi + {p}xphi * {p}xphi)"))
    cols.append((f"{p}cosphi", f"{p}xphi * (1.0 / {p}normphi)"))
    cols.append((f"{p}sinphi", f"{p}yphi * (1.0 / {p}normphi)"))
    cols.append((f"{p}phi", f"atan({p}yphi / {p}xphi)"))
    cols.append((f"{p}lam", f"atan2({p}ya, {p}xa)"))
    cols.append((f"{p}N",
                 f"{ell.a!r} / sqrt(1.0 - {ell.es!r} * {p}sinphi * {p}sinphi)"))
    cols.append((f"{p}h", f"{ell.a!r} * {p}pa / {p}cosphi - {p}N"))
    return f"{p}lam", f"{p}phi", f"{p}h"


def emit_helmert_fwd(cols: list, C, X: str, Y: str, Z: str,
                     pfx: str = "hm") -> tuple[str, str, str]:
    """Mirror kernels.helmert.helmert_fwd static 7-param (small-angle or
    exact, either convention): rotation entries + scale inlined as scalars
    computed by the SAME Python code the kernel runs."""
    from proj_spark.kernels.helmert import _rot_matrix

    R = _rot_matrix(C.rx, C.ry, C.rz, C.exact, C.position_vector)
    scale = 1.0 + C.s * 1e-6
    p = pfx
    rx0, ry0, rz0 = C.refp
    cols.append((f"{p}dX", f"{X} - {rx0!r}"))
    cols.append((f"{p}dY", f"{Y} - {ry0!r}"))
    cols.append((f"{p}dZ", f"{Z} - {rz0!r}"))
    for out, row, t in (("X", 0, C.x), ("Y", 1, C.y), ("Z", 2, C.z)):
        cols.append((
            f"{p}{out}",
            f"{scale!r} * ({R[row, 0]!r} * {p}dX + {R[row, 1]!r} * {p}dY"
            f" + {R[row, 2]!r} * {p}dZ) + {t!r}",
        ))
    return f"{p}X", f"{p}Y", f"{p}Z"
