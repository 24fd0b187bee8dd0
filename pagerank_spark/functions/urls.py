"""URL canonicalization — pure JVM column expressions, no UDFs.

Crawl frontiers, dedup keys, and host graphs all need ONE canonical form
per page url; Common-Crawl-style corpora carry every casing/port/fragment
variant. Every function here is built from `pyspark.sql.functions`
regex/string/array primitives, so the whole normalization stays inside
whole-stage codegen (the engine discipline: UDFs are the slow path), and
each rule has a 1:1 DuckDB string-function equivalent for the driver
oracle.

Rules of ``normalize_url`` (the common subset of RFC 3986 §6 semantics
that needs no network and no suffix list):
  * scheme and host lowercased;
  * default port stripped (``:80`` for http, ``:443`` for https);
  * fragment dropped;
  * empty path becomes ``/``;
  * query parameters sorted bytewise (stable dedup key for permuted
    params; empty query dropped).

``registered_domain`` is the last-two-labels heuristic — WITHOUT a public
suffix list this mislabels multi-label suffixes like ``co.uk`` (documented
approximation; plug a PSL-based UDF if that matters for your corpus).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOSTPORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host without the port ('' if not scheme-qualified)."""
    hp = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    return F.regexp_replace(hp, r":\d+$", "")


def url_port(url: Column) -> Column:
    """Explicit port as a string ('' when absent)."""
    hp = F.regexp_extract(url, _HOSTPORT_RE, 1)
    return F.regexp_extract(hp, r":(\d+)$", 1)


def url_path(url: Column) -> Column:
    """Path component; '' when absent (see normalize_url for the '/' rule)."""
    return F.regexp_extract(url, _PATH_RE, 1)


def url_query(url: Column) -> Column:
    return F.regexp_extract(url, _QUERY_RE, 1)


def registered_domain(url: Column) -> Column:
    """Last-two-labels domain of the host (heuristic, see module doc)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def url_depth(url: Column) -> Column:
    """Number of non-empty path segments."""
    return F.size(F.filter(F.split(url_path(url), "/"),
                           lambda x: x != ""))


def normalize_url(url: Column) -> Column:
    """Canonical form per the module-doc rules; '' for scheme-less input."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    drop_port = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = url_path(url)
    q = url_query(url)
    qnorm = F.array_join(F.array_sort(F.split(q, "&")), "&")
    return F.when(scheme == "", F.lit("")).otherwise(F.concat(
        scheme, F.lit("://"), host,
        F.when(drop_port, F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(qnorm == "", F.lit(""))
         .otherwise(F.concat(F.lit("?"), qnorm)),
    ))
