"""Rounding-contract guard: no oracle may round an exact-integer ratio
through a double.

The q345 trap (see SKILL.md and `ranks.half_up_ratio`): ``round(a/b, k)``
on exact integer operands is boundary-unstable across engines — Spark
rounds the double's exact BigDecimal expansion HALF_UP while DuckDB
scales by ``10^k`` in double first, and a power-of-two denominator can
land exactly ON a representable half. The r6 sweep converted every such
oracle site (and its Spark twin) to the integer half-up form
``((2·a·10^k + b) // (2·b)) / 10^k.0``; this test greps the source so
the class stays shut: every surviving ``round(CAST(… AS DOUBLE) … / …)``
must be on the audited allowlist below, each entry safe for a stated
reason (power-of-10 denominator → the round is an identity; irrational
sqrt denominator → can't land on an exact half; no division at all).

A new hit means either use `ranks.half_up_ratio` /
`half_up_ratio_signed` (+ the matching oracle form), or — if genuinely
safe — add it here WITH its reason.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "azure_batch_map_reduce_spark"

# Audited-safe `round(CAST(...) / ...)` snippets, whitespace-normalized.
# Reasons:
#   identity  — denominator is a power of 10 no finer than the rounding
#               digits, so round() never has anything to cut
#   sqrt      — denominator contains an IEEE sqrt; the quotient is
#               irrational and cannot equal a representable decimal half
ALLOWED = {
    # windows.py q340: credit_bp/10000 @4 — identity
    "round(CAST(sum(credit_bp) AS DOUBLE) / 10000, 4)",
    # relational.py q153: cents/100 @2 — identity
    "round(CAST(max(total_cents) AS DOUBLE) / 100, 2)",
    # graph.py q401: Pearson numerator over sqrt variances — sqrt
    "round(CAST(n * sxy - sx * sy AS DOUBLE) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)",
    # etl.py q168: cents/100 @2 — identity
    "round(CAST(sum(f.cents) AS DOUBLE) / 100, 2)",
    # text.py q51: n_stop/10 @4 — identity
    "round(CAST(n_stop AS DOUBLE) / 10, 4)",
    # similarity.py q397: integer-decimal dot products over sqrt — sqrt
    "round(CAST(num AS DOUBLE) / sqrt(CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE)), 6)",
    # text.py q427: watermark z = (2g−n)/sqrt(n) — sqrt (n is never a
    # perfect square times a power of 100 small enough to terminate;
    # and the flag itself compares the raw double, not the round)
    "round(CAST(2 * n_green - n_scored AS DOUBLE) / sqrt(CAST(n_scored AS DOUBLE)), 6)",
}


def _round_cast_divisions() -> set[str]:
    """Every `round(CAST(...)...)` call in the package whose argument
    list contains a division, normalized to single-space snippets."""
    found = set()
    call_re = re.compile(r"round\(CAST\(", re.S)
    for path in sorted(PKG.rglob("*.py")):
        src = path.read_text()
        for m in call_re.finditer(src):
            # Walk to the matching close paren of round(.
            depth = 0
            start = m.start()
            for i in range(start + len("round"), len(src)):
                c = src[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        call = src[start : i + 1]
                        break
            else:  # pragma: no cover - unbalanced parens
                raise AssertionError(f"unbalanced parens in {path}")
            if "/" in call:
                found.add(" ".join(call.split()))
    return found


def test_no_unaudited_double_rounded_ratio():
    hits = _round_cast_divisions()
    unaudited = hits - ALLOWED
    assert not unaudited, (
        "round(CAST(...)/...) on what may be an exact-integer ratio — "
        "use ranks.half_up_ratio + the ((2*a*10^k + b) // (2*b)) oracle "
        f"form, or allowlist with a reason:\n" + "\n".join(sorted(unaudited))
    )
    # The allowlist itself must not go stale: every entry still exists.
    stale = ALLOWED - hits
    assert not stale, "stale allowlist entries:\n" + "\n".join(sorted(stale))
