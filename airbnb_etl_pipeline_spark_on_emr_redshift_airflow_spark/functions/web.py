"""URL canonicalization and domain extraction as generated SQL.

Web-crawl curation (the RefinedWeb/C4-style front of a training-data
pipeline) starts from URLs: canonicalize them so syntactic variants of
the same page collapse to one key, extract the registered domain, then
apply per-domain caps and blocklists (``operators.web``). Like
``functions.text``, every classifier here is *generated SQL* that runs
identically under Spark SQL and DuckDB, so the whole chain is
oracle-checkable cross-engine — and on the Spark side it is pure
scan-stage expression work (whole-stage codegen, zero shuffles, zero
UDFs), which is what you want for a canonicalizer that runs over every
row of a 100 TB crawl.

Reference-parity note: the reference pipeline normalizes scraped-file
identity with string expressions on executor side
(``apps/process_listings_hosts.py`` filename/date parsing); this module
is the same scan-stage-normalization idea applied to the URL column a
web corpus carries.

Dialect notes (same policy as ``functions.text.redact_pii_sql``):

- DuckDB's ``regexp_replace`` replaces the FIRST match unless passed
  ``'g'``; Spark's is always global. The ``dialect`` knob appends the
  flag on the DuckDB side only.
- Replacement backreferences are ``$1`` in Spark (Java regex) but
  ``\\1`` in DuckDB (RE2).
- RE2 has no lookaround, so every pattern here is lookaround-free —
  separator repair after parameter stripping is done with explicit
  capture groups instead.
- Spark runs with ``spark.sql.parser.escapedStringLiterals=true``
  (session policy), so backslashes in patterns reach the regex engine
  literally, matching DuckDB's standard literals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query parameters that never identify content: tracking/campaign ids.
TRACKING_PARAMS = (
    "utm_[a-zA-Z]+",
    "gclid",
    "fbclid",
    "msclkid",
    "mc_cid",
    "mc_eid",
    "ref",
    "ref_src",
)

# Second-level public suffixes where the registered domain is three
# labels, not two (a pragmatic subset of the public-suffix list — the
# full list is data, not code, and would ship as a broadcast dim).
SECOND_LEVEL_SUFFIXES = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "gov.uk",
    "co.jp",
    "co.in",
    "co.kr",
    "co.nz",
    "com.au",
    "com.br",
    "com.cn",
    "com.mx",
    "com.tr",
    "com.sg",
)


def _dialect(dialect: str) -> tuple[str, str]:
    """Return (global-flag suffix, backref prefix) for the dialect."""
    if dialect == "spark":
        return "", "$"
    if dialect == "duckdb":
        return ", 'g'", "\\"
    raise ValueError(f"unknown dialect: {dialect}")


def canonicalize_url_sql(col_sql: str, dialect: str = "spark") -> str:
    """SQL canonicalizing a URL string so syntactic variants of the
    same resource compare equal:

    1. fragment dropped (``#...`` never reaches the server),
    2. scheme + authority lowercased (RFC 3986 §6.2.2.1 — path and
       query stay case-sensitive),
    3. default ports ``:80``/``:443`` dropped,
    4. tracking query parameters (``TRACKING_PARAMS``) removed with
       separator repair, a dangling ``?`` dropped,
    5. one trailing slash dropped (only when the URL has no query —
       a slash inside a query value is content).

    Composition order matters: the port pattern anchors on the
    authority, so it runs after lowercasing; parameter stripping runs
    before the trailing-``?``/``/`` cleanup that repairs what it
    leaves behind.
    """
    flag, bref = _dialect(dialect)
    u = col_sql
    # 1. fragment
    u = f"regexp_replace({u}, '#.*', ''{flag})"
    # 2. lowercase scheme://authority (prefix up to first /, ? past
    # the authority); regexp_extract('', no-match) is '' in both
    # engines so non-URL strings pass through unchanged.
    pre = f"regexp_extract({u}, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)"
    u = f"concat(lower({pre}), substr({u}, length({pre}) + 1))"
    # 3. default ports (optional userinfo before the host — 'user:pw@'
    # contains ':' so the host part alone can't be [^/:?#]+; the
    # userinfo group is lookaround-free for RE2)
    u = (
        f"regexp_replace({u}, "
        f"'^(https?://(?:[^/?#]*@)?[^/:?#]+):(80|443)([/?#]|$)', "
        f"'{bref}1{bref}3'{flag})"
    )
    alts = "|".join(TRACKING_PARAMS)
    # 4a. '&param=value' → ''
    u = f"regexp_replace({u}, '&(?:{alts})=[^&]*', ''{flag})"
    # 4b. '?param=value&rest' → '?rest'
    u = f"regexp_replace({u}, '[?](?:{alts})=[^&]*&', '?'{flag})"
    # 4c. lone '?param=value' at end, then any dangling '?'
    u = f"regexp_replace({u}, '[?](?:{alts})=[^&]*$', ''{flag})"
    u = f"regexp_replace({u}, '[?]$', ''{flag})"
    # 5. trailing slash (queryless URLs only; keeps 'https://')
    u = f"regexp_replace({u}, '^([^?#]*[^:/?#])/$', '{bref}1'{flag})"
    return u


def url_host_sql(col_sql: str) -> str:
    """Lowercased host (authority minus userinfo and port). Shared SQL
    — pure ``regexp_extract``/``lower``, no dialect knob needed."""
    auth = f"regexp_extract({col_sql}, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)"
    # strip userinfo@ then :port
    host = f"regexp_replace({auth}, '^[^@]*@', '')"
    host = f"regexp_replace({host}, ':[0-9]*$', '')"
    return f"lower({host})"


def registered_domain_sql(host_sql: str) -> str:
    """Registered domain of a host: the last two labels, or three when
    the two-label tail is a known second-level public suffix
    (``SECOND_LEVEL_SUFFIXES``). Single-label hosts (``localhost``)
    pass through. Shared SQL: label slicing is expressed with anchored
    ``regexp_extract`` (identical semantics in Spark and DuckDB,
    including '' on no-match) rather than engine-specific
    split/array-index functions."""
    two = f"regexp_extract({host_sql}, '[^.]+[.][^.]+$', 0)"
    three = f"regexp_extract({host_sql}, '[^.]+[.][^.]+[.][^.]+$', 0)"
    slds = ", ".join(f"'{s}'" for s in SECOND_LEVEL_SUFFIXES)
    return (
        f"CASE WHEN {two} IN ({slds}) AND {three} <> '' THEN {three} "
        f"WHEN {two} <> '' THEN {two} ELSE {host_sql} END"
    )


# ---- Spark Column wrappers ------------------------------------------


def canonicalize_url(col: str) -> Column:
    return F.expr(canonicalize_url_sql(col, "spark"))


def url_host(col: str) -> Column:
    return F.expr(url_host_sql(col))


def registered_domain(col: str) -> Column:
    """Registered domain straight from a URL column."""
    return F.expr(registered_domain_sql(url_host_sql(col)))
