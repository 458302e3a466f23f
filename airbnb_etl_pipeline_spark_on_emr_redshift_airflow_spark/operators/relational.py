"""Projection / normalization / union-with-schema-drift operators.

Reference behaviors rebuilt here (SURVEY.md §2.2, §2.7):

- bulk column normalization (reference ``apps/preprocess_data.py:85``)
- typed-null padding for schema alignment
  (``apps/process_listings_hosts.py:89-96``)
- the sort-columns + positional-union dance
  (``apps/process_listings_hosts.py:97,111,120``) re-expressed as
  ``unionByName(allowMissingColumns=True)`` — same result, no
  positional fragility
- exact dedup by key (``apps/process_reviews.py:148`` et al.)

All pure DataFrame transformations: no shuffles beyond what the
semantics require (dedup shuffles on its keys; unions are shuffle-free).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_columns(df: DataFrame) -> DataFrame:
    """Lowercase and underscore every column name.

    Rebuild of ``df.toDF(*[c.replace(' ', '_').lower() ...])``
    (reference ``apps/preprocess_data.py:85``).
    """
    return df.toDF(*[c.strip().replace(" ", "_").lower() for c in df.columns])


def with_typed_nulls(df: DataFrame, columns: dict[str, str]) -> DataFrame:
    """Append typed NULL columns (``{'col': 'double', ...}``).

    Rebuild of the SQL ``cast(null as T) as col`` padding at reference
    ``apps/process_listings_hosts.py:90-95``, used to align a narrow
    source with a wider target schema before a union.
    """
    out = df
    for name, dtype in columns.items():
        out = out.withColumn(name, F.lit(None).cast(dtype))
    return out


def align_union(*dfs: DataFrame) -> DataFrame:
    """Union DataFrames by column name, padding missing columns with
    typed nulls.

    Replaces the reference's positional trick — sort column names then
    ``union`` (``apps/process_listings_hosts.py:97,111,120``) — with
    ``unionByName(allowMissingColumns=True)``: same semantics, robust
    to column order, and missing columns inherit the type declared on
    the side that has them.
    """
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def exact_dedup(df: DataFrame, keys: Iterable[str]) -> DataFrame:
    """Keep one arbitrary row per key — ``dropDuplicates(keys)``
    (reference ``apps/process_reviews.py:148``). For a *deterministic*
    survivor use ``windows.latest_per_key`` with a full tie-break
    ordering instead; this variant is for when any survivor is valid.

    Scale note: hash-shuffles once on ``keys``; AQE coalesces the
    post-shuffle partitions. Prefer this over ``distinct()`` when only
    key uniqueness (not whole-row) matters, so Spark can drop payload
    columns from the comparison.
    """
    return df.dropDuplicates(list(keys))
