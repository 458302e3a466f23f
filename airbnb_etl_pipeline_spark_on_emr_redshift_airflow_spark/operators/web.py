"""Domain-level curation operators: per-domain caps and blocklists.

The two standard URL-level gates of a web-scale training-data pipeline
(RefinedWeb-style), downstream of ``functions.web``'s canonicalizer:

- a **per-domain cap** so no single site dominates the corpus (SEO
  farms, mirror hosts, auto-generated catalogs), and
- a **domain blocklist** (adult/malware/spam lists are maintained as
  data, joined as a dim table).

Scale shape: the cap is one hash shuffle on the domain key with a
deterministic in-group order (the same engine-portable md5 pseudo-order
as ``operators.sampling.group_sample_topk``, so the kept set is
reproducible and oracle-checkable, independent of cluster layout); the
blocklist is a broadcast anti-join — blocklists are dim-sized by
construction (millions of domains ≪ billions of documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.web import registered_domain_sql, url_host_sql
from .sampling import group_sample_topk


def with_domain(df: DataFrame, url_col: str, out_col: str = "domain") -> DataFrame:
    """Append the registered domain of ``url_col`` — scan-stage
    expression, zero shuffles."""
    return df.withColumn(
        out_col, F.expr(registered_domain_sql(url_host_sql(url_col)))
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    key_cols: list[str],
    prefilter_rate: float | None = None,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, chosen by the
    engine-portable md5 pseudo-order over ``key_cols`` (deterministic,
    layout-independent — re-running the pipeline keeps the SAME
    documents). Adds ``sample_rank`` (1..cap within the domain).

    One shuffle on the domain key. For head domains orders of
    magnitude above the cap (the exact situation the cap exists for),
    pass ``prefilter_rate`` to cut rows with a scan-stage hash
    predicate before the per-domain window sort — the same giant-group
    escape hatch as ``group_sample_topk`` (which this delegates to).
    """
    return group_sample_topk(
        df, domain_col, cap, key_cols, prefilter_rate=prefilter_rate
    )


def blocklist_filter(
    df: DataFrame, domain_col: str, blocked: DataFrame
) -> DataFrame:
    """Drop rows whose domain appears in ``blocked`` (one column named
    like ``domain_col``). Broadcast LEFT ANTI join: the blocklist is
    dim-sized, so no corpus shuffle — every executor filters its scan
    partition locally."""
    return df.join(
        F.broadcast(blocked.select(domain_col).distinct()),
        on=domain_col,
        how="left_anti",
    )
