"""Data-quality expectations (reference R18).

The reference applies DLT ``expect_all_or_drop`` — a named map of SQL
boolean expressions; a row is kept iff EVERY expectation passes
(`/root/reference/src/sdp_etl/transformations/02_silver_processing.py:94-95`,
`02:139-141`; example rules `/root/reference/README.md:113-116`).

We evaluate the same SQL expressions through Catalyst (``F.expr``) and
report per-rule violation counts via ``df.observe`` — metrics ride the
job itself (one pass), instead of a second counting job per rule.

Null semantics match DLT: an expectation evaluating to NULL is a
failure (kept rows need ``expr IS TRUE``).
"""

from __future__ import annotations

import uuid
from functools import reduce

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["expect_all_or_drop", "expectation_predicate"]


def expectation_predicate(rules: dict[str, str]):
    """AND of all rules, null-safe: NULL → row dropped (DLT semantics)."""
    preds = [F.expr(rule).eqNullSafe(F.lit(True)) for rule in rules.values()]
    return reduce(lambda a, b: a & b, preds)


def expect_all_or_drop(
    df: DataFrame, rules: dict[str, str] | None, with_metrics: bool = False
) -> DataFrame | tuple[DataFrame, Observation]:
    """Drop rows violating any rule. With ``with_metrics=True`` returns
    ``(df, observation)``; observation.get yields
    ``{rule_name: violation_count}`` after the first action — matching
    the per-rule drop counts DLT reports for expect_all_or_drop.
    """
    if not rules:
        return (df, None) if with_metrics else df
    keep = expectation_predicate(rules)
    if not with_metrics:
        return df.where(keep)
    obs = Observation(f"expectations_{uuid.uuid4().hex[:8]}")
    metric_cols = [
        F.sum((~F.expr(rule).eqNullSafe(F.lit(True))).cast("long")).alias(name)
        for name, rule in rules.items()
    ]
    observed = df.observe(obs, *metric_cols)
    return observed.where(keep), obs
