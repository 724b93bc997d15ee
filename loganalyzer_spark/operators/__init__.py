"""Operator helpers shared across modules."""

from pyspark.sql import DataFrame


def free_col(df: DataFrame, base: str) -> str:
    """A column name not present in ``df``, for internal temp columns.

    Passthrough operators (take a caller DataFrame, add a scratch
    column, drop it before returning) must not hard-code the scratch
    name: ``withColumn("_toks", ...)`` on a caller that already carries
    ``_toks`` silently REPLACES the caller's column and the trailing
    ``drop`` then deletes it from the output — data vanishes without
    an error. Underscore-suffix until free; deterministic, so plans
    stay stable for a given input schema.
    """
    name = base
    while name in df.columns:
        name += "_"
    return name
