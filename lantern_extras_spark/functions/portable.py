"""Engine-portable float rounding.

`F.round` in Spark rounds the *shortest decimal representation* of a double
(Java BigDecimal.valueOf semantics): round(4.021875, 5) → 4.02188. DuckDB
rounds the *binary* value (4.0218749999… → 4.02187). Any oracle comparison
that rounds floats therefore diverges exactly at representation boundaries —
found empirically by the adversarial parity gate.

`pround` instead computes floor(x·10ⁿ + 0.5)/10ⁿ: every step is plain IEEE-754
arithmetic that both engines (and Python) evaluate bit-identically, so the
rounded values always agree. Half-up toward +∞ for negatives — acceptable for
a comparison normalizer, which is this function's only job. The SQL mirror is
`sql_pround` / `portable_round_sql` (textual rewrite of round(...) calls).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(c: Column | str, scale: int) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    s = float(10**scale)
    return F.floor(col * s + F.lit(0.5)) / s


def sql_pround(expr: str, scale: int) -> str:
    s = float(10**scale)
    return f"(floor(({expr}) * {s} + 0.5) / {s})"


def portable_round_sql(sql: str) -> str:
    """Rewrite every `round(expr, n)` in a SQL string into the portable
    floor-form, handling nested parentheses."""
    out = []
    i = 0
    low = sql.lower()
    while True:
        j = low.find("round(", i)
        if j < 0:
            out.append(sql[i:])
            break
        # don't rewrite identifiers like xround(
        if j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            out.append(sql[i : j + 6])
            i = j + 6
            continue
        out.append(sql[i:j])
        depth = 1
        k = j + 6
        last_comma = -1
        while k < len(sql) and depth > 0:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                last_comma = k
            k += 1
        if last_comma < 0:
            # round(x) with no scale — leave untouched (integral rounding)
            out.append(sql[j:k])
        else:
            expr = portable_round_sql(sql[j + 6 : last_comma])  # recurse into nesting
            scale = int(sql[last_comma + 1 : k - 1].strip())
            out.append(sql_pround(expr, scale))
        i = k
    return "".join(out)
