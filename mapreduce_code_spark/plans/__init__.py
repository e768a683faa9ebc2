"""Derived logical views ("plans"): the engine adds no custom IR — its
plans ARE Catalyst plans (SURVEY.md §3.4). This package holds the reusable
DataFrame-building blocks shared by operators."""

from mapreduce_code_spark.plans.prep import (
    labeled_points,
    labeled_points_binary,
    labeled_points_scaled,
    transactions,
)

__all__ = [
    "transactions",
    "labeled_points",
    "labeled_points_binary",
    "labeled_points_scaled",
]
