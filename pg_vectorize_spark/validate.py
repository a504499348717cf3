"""Identifier validation — injection guard on job/column/table names.

Same rule as the reference (core/src/query.rs:194-203, core/src/config.rs:7-16):
identifiers are restricted to ``[A-Za-z0-9_]+``. Applied before any name is
interpolated into a Spark SQL string or a filesystem path.
"""

from __future__ import annotations

import re

from pg_vectorize_spark.errors import InvalidIdentifierError

_IDENT_RE = re.compile(r"^[A-Za-z0-9_]+$")


def check_input(name: str) -> str:
    """Validate an identifier; returns it unchanged if safe, else raises."""
    if not isinstance(name, str) or not _IDENT_RE.match(name):
        raise InvalidIdentifierError(
            f"invalid identifier (only [A-Za-z0-9_] allowed): {name!r}"
        )
    return name


def is_valid_identifier(name: str) -> bool:
    return isinstance(name, str) and bool(_IDENT_RE.match(name))
