"""Python UDTF extension surface (SURVEY §2.10).

The reference's pluggable ``DataCleanerProvider`` Protocol
(src/core/interfaces/data_cleaner.py:6-12) is a table-valued
transform: rows in, *differently-shaped* rows out. Spark's native
extension point for that contract is the Python UDTF — registered
once, callable from SQL as a table function (``LATERAL parse_kv(...)``),
so a user plugging custom row-expanding logic into the engine does it
here rather than forking an operator.

Slow-path warning, by design: a UDTF evaluates row-at-a-time in
Python. Everything the engine ships stays on the codegen/Arrow path
(the catalog query's oracle IS the built-in expression of the same
transform, and the two must hash-match); the UDTF exists so that
logic with no built-in expression has a sanctioned plug point. Keep
UDTF inputs pre-filtered/pre-aggregated — same rule as the PDF
parser, the engine's other Python extension.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="key string, value string", useArrow=True)
class ParseKv:
    """Explode a ``k=v;k2=v2`` config string into (key, value) rows.

    Malformed entries (no ``=``) are skipped; empty input yields no
    rows — a table function's natural null handling."""

    def eval(self, s: str):  # noqa: D102 - UDTF contract
        if not s:
            return
        for part in s.split(";"):
            k, sep, v = part.partition("=")
            if sep and k:
                yield (k, v)


def register_table_functions(spark) -> None:
    """Install the engine's table functions into a session's SQL
    namespace (idempotent). Every engine UDTF is declared
    ``useArrow=True`` (the flag binds at decoration, not at plan
    time): the plan node becomes ``ArrowEvalPythonUDTF`` (batched
    Arrow transfer) instead of ``BatchEvalPythonUDTF`` (row-at-a-time
    pickling) — the catalog-wide plan lint rejects the latter
    everywhere."""
    spark.udtf.register("parse_kv", ParseKv)
