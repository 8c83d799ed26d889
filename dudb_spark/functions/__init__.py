"""Scalar-function layer: predicate language compiler, storage calculators."""

from dudb_spark.functions.boolexpr import compile_expr, parse  # noqa: F401
from dudb_spark.functions.calculators import calculator  # noqa: F401
