"""Declarative data-quality constraints over lake tables — the
dbt-tests / Great-Expectations / Deequ surface reduced to its
relational core: a constraint suite compiles into AS FEW Spark jobs
as the constraint algebra allows, returns one row per constraint
with its violation count, and never ships rows to the driver.

Why in-engine: a 100 TB table can't be "checked" by a notebook loop;
the check IS a query, and its cost model matters —

- ``not_null`` / ``range`` / ``accepted_values`` / ``matches`` are
  row-local predicates: ALL of them fold into ONE aggregate pass
  over the table (a conditional sum each — map-side combined, one
  scan total, no shuffle of data rows);
- ``unique`` needs the key's duplication profile: one groupBy per
  distinct key tuple (count>1 groups), output-sized;
- ``foreign_key`` is a left-anti join against the parent's key set
  (broadcast when the parent is a dimension).

Each constraint reports ``n_violations`` (0 = pass) — counting
instead of failing fast is deliberate: a corpus gate wants the
violation PROFILE (how bad, which rule) to decide quarantine vs
fail, and the count query costs the same scan either way.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One declarative rule. ``kind`` ∈ {not_null, unique, range,
    accepted_values, matches, foreign_key, expression}."""

    name: str
    kind: str
    column: str | None = None
    columns: tuple[str, ...] = ()
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    pattern: str | None = None
    expr: str | None = None  # boolean SQL: TRUE = row passes
    parent: str | None = None  # registered name of the parent df
    parent_column: str | None = None

    def __post_init__(self):
        kinds = (
            "not_null", "unique", "range", "accepted_values",
            "matches", "foreign_key", "expression",
        )
        if self.kind not in kinds:
            raise ValueError(f"kind must be one of {kinds}, got {self.kind!r}")


def not_null(name: str, column: str) -> Constraint:
    return Constraint(name, "not_null", column=column)


def unique(name: str, *columns: str) -> Constraint:
    return Constraint(name, "unique", columns=tuple(columns))


def in_range(name: str, column: str, lo: float, hi: float) -> Constraint:
    """Closed interval [lo, hi]; NULL passes (compose with not_null)."""
    return Constraint(name, "range", column=column, lo=lo, hi=hi)


def accepted_values(name: str, column: str, *values) -> Constraint:
    return Constraint(name, "accepted_values", column=column, values=tuple(values))


def matches(name: str, column: str, pattern: str) -> Constraint:
    """Unanchored regex search (Spark ``rlike`` / DuckDB
    ``regexp_matches`` semantics — anchor with ^$ for full match);
    NULL passes."""
    return Constraint(name, "matches", column=column, pattern=pattern)


def foreign_key(
    name: str, column: str, parent: str, parent_column: str
) -> Constraint:
    """Every non-null child value exists in the parent key set."""
    return Constraint(
        name, "foreign_key", column=column, parent=parent,
        parent_column=parent_column,
    )


def expression(name: str, expr: str) -> Constraint:
    """Arbitrary boolean SQL over the row; TRUE/NULL-is-false = pass
    is NOT the convention here — a row violates iff the expression
    is FALSE or NULL (unknown is not proof of health)."""
    return Constraint(name, "expression", expr=expr)


def _row_violation(c: Constraint) -> Column:
    """Boolean 'this row violates' column for row-local kinds."""
    col = F.col(c.column) if c.column else None
    if c.kind == "not_null":
        return col.isNull()
    if c.kind == "range":
        return col.isNotNull() & ~col.between(F.lit(c.lo), F.lit(c.hi))
    if c.kind == "accepted_values":
        return col.isNotNull() & ~col.isin(list(c.values))
    if c.kind == "matches":
        return col.isNotNull() & ~col.rlike(c.pattern)
    if c.kind == "expression":
        e = F.expr(c.expr)
        return ~F.coalesce(e, F.lit(False))
    raise AssertionError(c.kind)


_ROW_LOCAL = ("not_null", "range", "accepted_values", "matches", "expression")


def check_constraints(
    df: DataFrame,
    constraints: Sequence[Constraint],
    parents: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate a suite; returns (constraint, kind, n_violations)
    with one output row per constraint, n_violations=0 meaning pass.

    Row-local constraints share ONE aggregate scan; each ``unique``
    adds one output-sized groupBy; each ``foreign_key`` one
    broadcast left-anti count. Deterministic by construction — every
    result is an exact count."""
    parents = parents or {}
    names = [c.name for c in constraints]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate constraint names in {names}")
    pieces: list[DataFrame] = []

    row_local = [c for c in constraints if c.kind in _ROW_LOCAL]
    if row_local:
        aggs = [
            F.sum(_row_violation(c).cast("long")).alias(c.name) for c in row_local
        ]
        one = df.agg(*aggs)
        # one row -> (constraint, kind, n_violations) rows via stack
        kinds = {c.name: c.kind for c in row_local}
        stacked = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c.name).alias("constraint"),
                            F.lit(kinds[c.name]).alias("kind"),
                            F.coalesce(F.col(c.name), F.lit(0))
                            .cast("long")
                            .alias("n_violations"),
                        )
                        for c in row_local
                    ]
                )
            ).alias("r")
        ).select("r.constraint", "r.kind", "r.n_violations")
        pieces.append(stacked)

    for c in constraints:
        if c.kind == "unique":
            dup = (
                df.groupBy(*[F.col(k) for k in c.columns])
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                    .cast("long")
                    .alias("n_violations")
                )
                .select(
                    F.lit(c.name).alias("constraint"),
                    F.lit("unique").alias("kind"),
                    "n_violations",
                )
            )
            pieces.append(dup)
        elif c.kind == "foreign_key":
            if c.parent not in parents:
                raise ValueError(
                    f"constraint {c.name!r} references parent {c.parent!r} "
                    f"not in parents={sorted(parents)}"
                )
            pk = parents[c.parent].select(
                F.col(c.parent_column).alias(c.column)
            ).dropDuplicates()
            orphans = (
                df.where(F.col(c.column).isNotNull())
                .join(F.broadcast(pk), c.column, "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
                .select(
                    F.lit(c.name).alias("constraint"),
                    F.lit("foreign_key").alias("kind"),
                    "n_violations",
                )
            )
            pieces.append(orphans)

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
