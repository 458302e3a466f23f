"""Grouped-map Pandas operators (``applyInPandas``) — the per-group
escape hatch for semantics built-in aggregates can't express (curve
fitting, interpolation, per-group model scoring).

Used sparingly by design: everything else in this engine is JVM-side.
The example operator (per-group z-score) IS window-expressible — tests
assert the two paths agree — so it doubles as the template for the
genuinely non-expressible cases and as proof the seam is wired
correctly (schema contract, empty groups, Arrow round-trip).

Scale: one shuffle on the group key; each group must fit in one
worker's memory (pandas materializes the group) — use mapInPandas or
window functions when groups can be huge.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def zscore_per_group(
    df: DataFrame, group: str, value: str, out: str = "zscore"
) -> DataFrame:
    """Per-group standardization via grouped-map pandas: z = (x - μ)/σ
    (population σ; 0.0 for single-row/constant groups)."""
    out_schema = f"{group} long, {value} double, {out} double"

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf[value].mean()
        sigma = pdf[value].std(ddof=0)
        z = (pdf[value] - mu) / sigma if sigma > 0 else 0.0
        return pd.DataFrame(
            {group: pdf[group], value: pdf[value], out: z}
        )

    return df.select(group, value).groupBy(group).applyInPandas(
        standardize, schema=out_schema
    )
