"""Filter-string parser unit suite.

Ports the themes of the reference's 40+ inline tests
(core/src/query.rs:823-1433): operators, default equality, numeric edge
cases (scientific notation, i64::MAX, NaN/infinity, leading zeros,
octal-as-decimal, hex-as-string), case sensitivity, whitespace, malformed
input, comparison-requires-numeric.
"""

from __future__ import annotations

import math

import pytest

from pg_vectorize_spark.errors import FilterParseError, InvalidIdentifierError
from pg_vectorize_spark.filters import (
    FilterValue,
    filters_to_sql,
    parse_filter,
    parse_filters,
)


class TestOperators:
    def test_eq(self):
        assert parse_filter("eq.25") == FilterValue("=", 25)

    def test_gt(self):
        assert parse_filter("gt.25") == FilterValue(">", 25)

    def test_gte(self):
        assert parse_filter("gte.25") == FilterValue(">=", 25)

    def test_lt(self):
        assert parse_filter("lt.25") == FilterValue("<", 25)

    def test_lte(self):
        assert parse_filter("lte.25") == FilterValue("<=", 25)

    def test_bare_value_is_equality(self):
        assert parse_filter("25") == FilterValue("=", 25)

    def test_bare_string_is_equality(self):
        assert parse_filter("electronics") == FilterValue("=", "electronics")

    def test_unknown_op_prefix_is_string_equality(self):
        # "invalid.25" has no recognized operator -> whole string equality
        fv = parse_filter("invalid.25")
        assert fv.op == "=" and fv.value == "invalid.25"

    def test_op_alone_is_string_equality(self):
        assert parse_filter("gt") == FilterValue("=", "gt")

    def test_case_sensitive_ops(self):
        # "GT.25" is not an operator (reference ops are lowercase)
        fv = parse_filter("GT.25")
        assert fv.op == "=" and fv.value == "GT.25"


class TestTypeInference:
    def test_bool_true(self):
        fv = parse_filter("true")
        assert fv.value is True and fv.type_name == "boolean"

    def test_bool_false(self):
        fv = parse_filter("false")
        assert fv.value is False

    def test_bool_case_sensitive(self):
        # Rust bool parse accepts only lowercase literals
        assert parse_filter("True").value == "True"
        assert parse_filter("FALSE").value == "FALSE"

    def test_int(self):
        fv = parse_filter("eq.42")
        assert fv.value == 42 and fv.type_name == "integer"

    def test_negative_int(self):
        assert parse_filter("eq.-7").value == -7

    def test_plus_signed_int(self):
        assert parse_filter("eq.+7").value == 7

    def test_i64_max(self):
        assert parse_filter("eq.9223372036854775807").value == 2**63 - 1

    def test_i64_min(self):
        assert parse_filter("eq.-9223372036854775808").value == -(2**63)

    def test_int_overflow_becomes_float(self):
        fv = parse_filter("eq.9223372036854775808")
        assert isinstance(fv.value, float)

    def test_float(self):
        fv = parse_filter("gte.24.5")
        assert fv.value == 24.5 and fv.type_name == "float"

    def test_scientific_notation(self):
        assert parse_filter("gt.1e3").value == 1000.0
        assert parse_filter("gt.2.5E-2").value == 0.025

    def test_leading_zeros_are_decimal(self):
        # "010" parses as decimal 10, never octal
        assert parse_filter("eq.010").value == 10

    def test_hex_is_string(self):
        fv = parse_filter("eq.0x1A")
        assert fv.value == "0x1A" and fv.type_name == "string"

    def test_nan(self):
        fv = parse_filter("gt.NaN")
        assert isinstance(fv.value, float) and math.isnan(fv.value)

    def test_infinity(self):
        assert parse_filter("gt.inf").value == math.inf
        assert parse_filter("lt.-infinity").value == -math.inf

    def test_underscores_not_numeric(self):
        # Python float("1_0") would accept this; Rust parse does not
        assert parse_filter("eq.1_0").value == "1_0"

    def test_whitespace_not_numeric(self):
        assert parse_filter("eq. 25").value == " 25"

    def test_empty_value_equality(self):
        assert parse_filter("eq.").value == ""

    def test_float_with_trailing_dot(self):
        assert parse_filter("eq.25.").value == 25.0

    def test_double_dot_value(self):
        # "gte.24.5" -> op gte, value "24.5" (only first dot splits)
        assert parse_filter("gte.24.5").value == 24.5


class TestComparisonRequiresNumeric:
    @pytest.mark.parametrize("op", ["gt", "gte", "lt", "lte"])
    def test_string_comparison_rejected(self, op):
        with pytest.raises(FilterParseError):
            parse_filter(f"{op}.abc")

    def test_bool_comparison_rejected(self):
        with pytest.raises(FilterParseError):
            parse_filter("gt.true")

    def test_empty_comparison_rejected(self):
        with pytest.raises(FilterParseError):
            parse_filter("gt.")


class TestParseFilters:
    def test_sorted_deterministic(self):
        f1 = parse_filters({"b": "eq.1", "a": "eq.2"})
        f2 = parse_filters({"a": "eq.2", "b": "eq.1"})
        assert list(f1) == ["a", "b"] and f1 == f2

    def test_invalid_column_rejected(self):
        with pytest.raises(InvalidIdentifierError):
            parse_filters({"a; drop table": "eq.1"})

    def test_to_sql(self):
        fs = parse_filters({"price": "gte.24.5", "cat": "eq.electronics"})
        assert filters_to_sql(fs) == "cat = 'electronics' AND price >= 24.5"

    def test_to_sql_escapes_quotes(self):
        fs = parse_filters({"name": "eq.o'brien"})
        assert filters_to_sql(fs) == "name = 'o''brien'"
