"""Typed filter predicates — the ``"op.value"`` filter-string mini-language.

Reproduces the semantics of the reference's filter layer:

- operators ``eq gt gte lt lte`` mapping to ``= > >= < <=``
  (core/src/query.rs:13-39);
- a bare value (no ``op.`` prefix) means equality (core/src/query.rs:82-120);
- value type inference order is bool -> i64 -> f64 -> string
  (core/src/query.rs:122-176);
- comparison operators (gt/gte/lt/lte) REQUIRE a numeric value — a
  non-numeric comparison value is a parse error;
- filters are applied AFTER candidate ranking (placement parity with the
  generated SQL, core/src/query.rs:668-675, 724-731).

Type-inference details mirrored from Rust's ``str::parse``:
- bool: only the exact lowercase literals ``true`` / ``false``;
- i64: optional sign + digits, must fit in 64-bit signed range (out-of-range
  integers fall through to f64);
- f64: standard float syntax incl. scientific notation, ``inf``/``infinity``/
  ``nan`` (any case); NO embedded whitespace or underscores (Python's
  ``float()`` is more permissive than Rust's parser — we reject those here);
- anything else: string (only legal for equality).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pg_vectorize_spark.errors import FilterParseError
from pg_vectorize_spark.validate import check_input

I64_MIN = -(2**63)
I64_MAX = 2**63 - 1

_OPS = {
    "eq": "=",
    "gt": ">",
    "gte": ">=",
    "lt": "<",
    "lte": "<=",
}

_COMPARISON_OPS = {"gt", "gte", "lt", "lte"}

_INT_RE = re.compile(r"^[+-]?[0-9]+$")
# Rust f64 FromStr grammar (simplified): sign, digits with optional fraction,
# optional exponent; or inf/infinity/nan (case-insensitive).
_FLOAT_RE = re.compile(
    r"^[+-]?("
    r"(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?"
    r"|inf(?:inity)?|nan"
    r")$",
    re.IGNORECASE,
)

FilterScalar = Union[str, int, float, bool]


@dataclass(frozen=True)
class FilterValue:
    """A parsed filter: SQL operator plus a typed scalar."""

    op: str  # one of = > >= < <=
    value: FilterScalar

    @property
    def type_name(self) -> str:
        if isinstance(self.value, bool):
            return "boolean"
        if isinstance(self.value, int):
            return "integer"
        if isinstance(self.value, float):
            return "float"
        return "string"


def _infer_scalar(raw: str) -> FilterScalar:
    """bool -> i64 -> f64 -> string inference (core/src/query.rs:122-176)."""
    if raw == "true":
        return True
    if raw == "false":
        return False
    if _INT_RE.match(raw):
        v = int(raw)
        if I64_MIN <= v <= I64_MAX:
            return v
        # out-of-range integers fall through to float, like Rust's chain
        return float(raw)
    if _FLOAT_RE.match(raw):
        return float(raw)
    return raw


def _numeric_scalar(raw: str, op: str) -> FilterScalar:
    if _INT_RE.match(raw):
        v = int(raw)
        if I64_MIN <= v <= I64_MAX:
            return v
        return float(raw)
    if _FLOAT_RE.match(raw):
        return float(raw)
    raise FilterParseError(
        f"comparison operator {op!r} requires a numeric value, got {raw!r}"
    )


def parse_filter(raw: str) -> FilterValue:
    """Parse one filter string, e.g. ``"gte.25"`` -> ``FilterValue('>=', 25)``.

    A value with no recognized ``op.`` prefix is an equality filter on the
    whole string (so ``"25"`` -> ``= 25`` and ``"eq.25"`` -> ``= 25``; note
    ``"gt"`` alone is a plain equality against the string ``"gt"``).
    """
    if not isinstance(raw, str):
        raise FilterParseError(f"filter must be a string, got {type(raw).__name__}")
    op_key, sep, rest = raw.partition(".")
    if sep and op_key in _OPS:
        if op_key in _COMPARISON_OPS:
            return FilterValue(_OPS[op_key], _numeric_scalar(rest, op_key))
        return FilterValue("=", _infer_scalar(rest))
    return FilterValue("=", _infer_scalar(raw))


def parse_filters(raw_filters: dict[str, str]) -> dict[str, FilterValue]:
    """Parse a map of column -> filter-string, validating column names.

    Keys are sorted (BTreeMap parity, core/src/query.rs:13) so that bind/apply
    order is deterministic and independent of input ordering
    (server/tests/tests.rs:158-286 assert filter-order invariance).
    """
    out: dict[str, FilterValue] = {}
    for col in sorted(raw_filters):
        check_input(col)
        out[col] = parse_filter(raw_filters[col])
    return out


def filter_condition(column: str, fv: FilterValue) -> Column:
    """Build the Spark Column predicate for one parsed filter."""
    c = F.col(column)
    v = F.lit(fv.value)
    if fv.op == "=":
        return c == v
    if fv.op == ">":
        return c > v
    if fv.op == ">=":
        return c >= v
    if fv.op == "<":
        return c < v
    if fv.op == "<=":
        return c <= v
    raise FilterParseError(f"unknown operator {fv.op!r}")


def apply_filters(df: DataFrame, filters: dict[str, FilterValue]) -> DataFrame:
    """AND-apply parsed filters (post-ranking placement is the caller's job)."""
    for col in sorted(filters):
        df = df.filter(filter_condition(col, filters[col]))
    return df


def filters_to_sql(filters: dict[str, FilterValue], prefix: str = "") -> str:
    """Render parsed filters as an ANSI-SQL conjunction (for oracle parity)."""
    parts = []
    for col in sorted(filters):
        fv = filters[col]
        if isinstance(fv.value, bool):
            lit = "TRUE" if fv.value else "FALSE"
        elif isinstance(fv.value, (int, float)):
            lit = repr(fv.value)
        else:
            escaped = str(fv.value).replace("'", "''")
            lit = f"'{escaped}'"
        parts.append(f"{prefix}{col} {fv.op} {lit}")
    return " AND ".join(parts) if parts else "TRUE"
