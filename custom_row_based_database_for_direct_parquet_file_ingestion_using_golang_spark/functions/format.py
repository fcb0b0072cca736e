"""Result presentation (R1): the reference's fixed-width table format.

The reference prints results as 20-character left-padded columns with a
dash separator line and ``NULL`` for missing values
(pkg/handlers/select.go:477-512 for aggregated output, 567-597 for rows).
Presentation only — the engine API returns DataFrames; this exists so CLI
output is drop-in familiar to reference users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

COL_WIDTH = 20


def format_rows(columns: list[str], rows: list[tuple]) -> str:
    def cell(v) -> str:
        s = "NULL" if v is None else str(v)
        return s.ljust(COL_WIDTH)

    header = "".join(c.ljust(COL_WIDTH) for c in columns)
    sep = "-" * len(header.rstrip())
    body = "\n".join("".join(cell(v) for v in row).rstrip() for row in rows)
    out = f"{header.rstrip()}\n{sep}"
    return f"{out}\n{body}" if rows else out


def format_result(df: DataFrame, limit: int = 1000) -> str:
    """Materialize up to ``limit`` rows and render them reference-style."""
    rows = [tuple(r) for r in df.limit(limit).collect()]
    return format_rows(df.columns, rows)


def render_statement_result(result) -> str:
    """Reference-style rendering for any RefSQL statement outcome — the ONE
    dispatch shared by the CLI REPL and the web API (a second copy would
    drift the two surfaces): DataFrame → fixed-width table, int → DML
    rowcount, str → maintenance status line, list → SHOW output, None →
    OK."""
    if result is None:
        return "OK"
    if isinstance(result, str):
        return result
    if isinstance(result, bool):  # guard: bool is an int subclass
        return str(result)
    if isinstance(result, int):
        return f"{result} row(s) affected"
    if isinstance(result, list):
        return "\n".join(result)
    return format_result(result)
