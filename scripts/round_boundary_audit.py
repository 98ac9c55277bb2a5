#!/usr/bin/env python3
"""DuckDB-side twin of RoundBoundarySpec: audits the installed
DuckDB's round(x, 6) against the repo's pinned Spark convention
(shortest-decimal-representation HALF_UP) across the half-boundary
sweep, so a driver/engine version drift in rounding surfaces locally
before it costs a gate round.

The two conventions are KNOWN to diverge on a thin input class:
doubles whose shortest repr ends exactly in ...5 at the 7th decimal
while x*1e6 lands on the other side of .5 (DuckDB 1.0 rounds the
scaled double). ~29 of the ~3.9k swept inputs diverge against DuckDB
1.0.0. The repo's defense is recipe-level: float outputs are either
produced by engine-identical IEEE chains both ways of the shared
round, or are exact-quotient UNROUNDED. This audit exists to (a)
quantify the divergence set for the installed engine version and
(b) fail loudly (--strict) if a NEW divergence class appears, which
would mean the rounding convention itself changed.

Usage: python3 scripts/round_boundary_audit.py [--strict]
"""
import math
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb

# Divergence rate vs DuckDB 1.0.0 measured at authoring time; a
# strict run fails if the installed engine diverges MORE than this
# (a new rounding behavior), not on the known class itself.
KNOWN_DIVERGENT_MAX = 40


def spark_convention(x: float) -> float:
    """BigDecimal.valueOf(x).setScale(6, HALF_UP): round the SHORTEST
    decimal representation (repr) half-up at 6dp."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def sweep() -> list:
    xs = set()
    for k in range(0, 2000, 7):
        b = (k + 0.5) / 1e6
        xs |= {b, math.nextafter(b, 0), math.nextafter(b, 1)}
    for m in range(1, 400):
        for n in (3, 7, 11, 13, 160000, 320000, 2000000):
            xs.add(m / n)
    for an in range(1, 2000, 2):
        xs.add((an / 1e6) / 2)
    return sorted(xs)


def main() -> int:
    strict = "--strict" in sys.argv
    con = duckdb.connect()
    xs = sweep()
    rows = con.execute(
        "SELECT round(x::DOUBLE, 6) FROM (SELECT unnest(?) AS x)", [xs]
    ).fetchall()
    div = [(x, d, spark_convention(x))
           for x, (d,) in zip(xs, rows) if d != spark_convention(x)]
    print(f"swept {len(xs)} half-boundary/quotient inputs "
          f"against duckdb {duckdb.__version__}")
    print(f"divergent from the Spark convention: {len(div)}")
    for x, d, s in div[:10]:
        print(f"  x={x!r} duckdb={d!r} spark-convention={s!r}")
    if len(div) > 10:
        print(f"  ... and {len(div) - 10} more")
    if strict and len(div) > KNOWN_DIVERGENT_MAX:
        print(f"STRICT FAIL: divergence set grew past the known class "
              f"({len(div)} > {KNOWN_DIVERGENT_MAX}) — the installed "
              "DuckDB changed its double rounding; audit every "
              "still-rounded oracle before the next gate run.")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
