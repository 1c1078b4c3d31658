"""URL canonicalization + domain extraction — the web-ingest tier that
sits beside html_to_text (C4/RefinedWeb-style pipelines dedup and group
crawl documents by canonical URL and registered domain before any text
stage runs).

Reference scope note: the reference corpus carries source/url metadata on
every document (`AI_Cost_Cutting_Market_Analysis/src/search.py:427-448`
exposes `url` on each Document) but does no URL normalization — this
module is part of the beyond-reference training-data tier (COVERAGE.md).

Design contract (same as functions/text.py's HTML_STRIP_STEPS): ONE step
table compiles the Spark Column expression, the DuckDB oracle SQL, and
the Python reference, so the three implementations cannot drift. All
patterns stay inside the RE2-compatible subset (no lookaround, no
backreferences) so Java regex and DuckDB's RE2 agree; replacements are
stored Java-style (``$1``) and converted to ``\\1`` for RE2/Python.

Canonicalization semantics (documented, deliberately conservative):
- scheme and authority lowercase; path/query case is preserved
  (path case is significant per RFC 3986)
- fragment stripped (never reaches the server)
- a fixed list of tracking query params stripped (utm_*, fbclid, gclid,
  msclkid, yclid, igshid, mc_eid, mkt_tok, _hsenc, _hsmi); list is a
  module constant, lowercase-only by convention
- default ports :80 (http) and :443 (https) stripped
- NO trailing-slash folding and NO percent-encoding normalization —
  both change semantics on real servers; declared out of scope
- registered domain = approximate eTLD+1: last two host labels, or
  three when the middle label is a known multi-part public-suffix
  second level (co/com/org/net/gov/ac/edu under a ccTLD). IPv4 hosts
  pass through whole. A full public-suffix-list tier would slot behind
  the same signature; the shortlist is the engine-portable core.

Everything is a codegen'd regexp chain — zero UDFs, zero shuffles; at
100 TB this is a free map stage fused into the scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query params dropped during canonicalization (lowercase by convention)
TRACKING_PARAMS = (
    "utm_[a-z0-9_]*",
    "fbclid",
    "gclid",
    "msclkid",
    "yclid",
    "igshid",
    "mc_eid",
    "mkt_tok",
    "_hsenc",
    "_hsmi",
)

_TRACK = "|".join(TRACKING_PARAMS)

#: (pattern, java_replacement) — applied IN ORDER after the scheme+host
#: lowercase pass. RE2-safe; replacements use $1 (Java), converted to \1
#: for DuckDB/Python.
URL_CANON_STEPS: tuple[tuple[str, str], ...] = (
    # fragment first: nothing after '#' reaches the server
    (r"(?s)#.*", ""),
    # tracking params with their LEADING separator, global
    (rf"[?&](?:{_TRACK})=[^&]*", ""),
    # if the removed param was first, the next param kept its '&':
    # "path&x=2" -> "path?x=2"  ([^?&]* cannot skip an earlier '?')
    (r"^([^?&]*)&", "$1?"),
    # a query that became empty leaves a bare trailing '?'
    (r"\?$", ""),
    # default ports (after the lowercase pass, schemes are lowercase)
    (r"^(http://[^/?#]*):80([/?#]|$)", "$1$2"),
    (r"^(https://[^/?#]*):443([/?#]|$)", "$1$2"),
)

#: scheme://authority prefix — the only case-insensitive region
_PREFIX_PAT = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"

#: host out of a CANONICAL url: group 1, userinfo skipped, port kept
_HOSTPORT_PAT = r"^[a-z][a-z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#]*)"

#: approximate eTLD+1 (leftmost scan lands on the shortest valid suffix;
#: 3-label alternative listed first so "bbc.co.uk" beats "co.uk")
_MULTI_2LD = "co|com|org|net|gov|ac|edu"
_MULTI_CC = "uk|au|jp|br|cn|in|nz|za|mx|ar|id|kr|tr"
_DOMAIN_PAT = (
    rf"(?:[^.]+\.(?:{_MULTI_2LD})\.(?:{_MULTI_CC})|[^.]+\.[^.]+)$"
)

_IPV4_PAT = r"^(?:[0-9]{1,3}\.){3}[0-9]{1,3}$"


def _re2_repl(java_repl: str) -> str:
    """$1 -> \\1 (DuckDB RE2 / Python re replacement syntax)."""
    return java_repl.replace("$", "\\")


def canonicalize_url_expr(url: Column) -> Column:
    """Canonical URL as a pure Column chain (see module contract)."""
    out = F.concat(
        F.lower(F.regexp_extract(url, _PREFIX_PAT, 0)),
        F.regexp_replace(url, _PREFIX_PAT, ""),
    )
    for pat, repl in URL_CANON_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return out


def canonicalize_url_py(url: str) -> str:
    """Python reference — same prefix pass + step table."""
    m = re.match(_PREFIX_PAT, url)
    out = (m.group(0).lower() + url[m.end():]) if m else url
    for pat, repl in URL_CANON_STEPS:
        out = re.sub(pat, _re2_repl(repl), out)
    return out


def canonicalize_url_sql(col_sql: str) -> str:
    """DuckDB twin, compiled from the same table ('g' flag = Java's
    always-global regexp_replace; anchored steps match once anyway)."""
    out = (
        f"LOWER(REGEXP_EXTRACT({col_sql}, '{_PREFIX_PAT}')) || "
        f"REGEXP_REPLACE({col_sql}, '{_PREFIX_PAT}', '', 'g')"
    )
    for pat, repl in URL_CANON_STEPS:
        p = pat.replace("'", "''")
        r = _re2_repl(repl).replace("'", "''")
        out = f"REGEXP_REPLACE({out}, '{p}', '{r}', 'g')"
    return out


def url_host_expr(canonical_url: Column) -> Column:
    """Host (lowercase, port stripped) of a CANONICAL url; '' when the
    input has no scheme://authority prefix."""
    hostport = F.regexp_extract(canonical_url, _HOSTPORT_PAT, 1)
    return F.regexp_replace(hostport, r":[0-9]*$", "")


def url_host_sql(col_sql: str) -> str:
    return (
        f"REGEXP_REPLACE(REGEXP_EXTRACT({col_sql}, '{_HOSTPORT_PAT}', 1), "
        f"':[0-9]*$', '', 'g')"
    )


def url_host_py(canonical_url: str) -> str:
    m = re.match(_HOSTPORT_PAT, canonical_url)
    return re.sub(r":[0-9]*$", "", m.group(1)) if m else ""


def registered_domain_expr(host: Column) -> Column:
    """Approximate eTLD+1 of a host (module contract); the host itself
    for IPv4 literals and single-label hosts."""
    d = F.regexp_extract(host, _DOMAIN_PAT, 0)
    return F.when(host.rlike(_IPV4_PAT), host).otherwise(
        F.coalesce(F.nullif(d, F.lit("")), host)
    )


def registered_domain_sql(col_sql: str) -> str:
    return (
        f"CASE WHEN REGEXP_MATCHES({col_sql}, '{_IPV4_PAT}') THEN {col_sql} "
        f"ELSE COALESCE(NULLIF(REGEXP_EXTRACT({col_sql}, '{_DOMAIN_PAT}'), ''), {col_sql}) END"
    )


def registered_domain_py(host: str) -> str:
    if re.match(_IPV4_PAT, host):
        return host
    m = re.search(_DOMAIN_PAT, host)
    return m.group(0) if m and m.group(0) else host
