"""Expression helpers reproducing the reference's WHERE semantics on
weakly-typed (all-TEXT) columns.

The reference compares dynamically: if both operands parse as floats the
comparison is numeric, otherwise it is lexicographic on the string
renderings (pkg/expr/expr.go:90-156, toFloat at expr.go:31-47). On properly
typed Spark columns none of this is needed — Catalyst compares natively and
these helpers are not in the hot path. They exist for reference-parity
queries over ``all_text=True`` imported tables (the reference types every
import TEXT, pkg/importer/importer.go:37-52).

Everything here is built-in Column algebra — JVM-side, codegen-friendly,
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def try_num(c: Column | str) -> Column:
    """Numeric reading of a value, NULL if it doesn't parse — the Spark
    equivalent of the reference's ``toFloat`` sniff (expr.go:31-47)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("string").try_cast("double")


def dual_compare(left: Column | str, op: str, right) -> Column:
    """Numeric comparison iff both sides parse as numbers, else string
    comparison — the reference's dual-mode operator semantics
    (expr.go:121-154) as a single Catalyst expression tree.
    """
    lcol = F.col(left) if isinstance(left, str) else left
    rcol = F.lit(right) if not isinstance(right, Column) else right
    ln, rn = try_num(lcol), try_num(rcol)
    ls, rs = lcol.cast("string"), rcol.cast("string")
    ops = {
        "=": lambda a, b: a == b,
        "==": lambda a, b: a == b,
        "!=": lambda a, b: a != b,
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
    }
    if op not in ops:
        raise ValueError(f"unsupported comparator {op!r}")
    f = ops[op]
    both_numeric = ln.isNotNull() & rn.isNotNull()
    return F.when(both_numeric, f(ln, rn)).otherwise(f(ls, rs))


def ref_like(c: Column | str, pattern: str) -> Column:
    """The reference's restricted LIKE (expr.go:250-277): only four shapes —
    ``%pat%`` → contains, ``%pat`` → endswith, ``pat%`` → startswith,
    no ``%`` → exact equality. No ``_`` wildcard, no interior ``%``.
    (Standard SQL LIKE remains available via ``Column.like`` — a superset.)
    """
    col = F.col(c) if isinstance(c, str) else c
    if pattern.startswith("%") and pattern.endswith("%") and len(pattern) >= 2:
        return col.contains(pattern[1:-1])
    if pattern.startswith("%"):
        return col.endswith(pattern[1:])
    if pattern.endswith("%"):
        return col.startswith(pattern[:-1])
    return col == pattern


def truthy(c: Column | str) -> Column:
    """Bare-operand truthiness: an operand with no comparator means
    ``operand != false`` (expr.go:515-517)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("boolean") == F.lit(True)
