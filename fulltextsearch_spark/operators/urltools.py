"""URL-level curation for web corpora: normalization, URL dedup, domain caps.

Every large-scale Common-Crawl-style pipeline runs a URL stage before (or
beside) text dedup: the same page is fetched under many spellings of one
URL (scheme/host case, default ports, tracking parameters, parameter
order, fragments, trailing slashes), and a handful of hosts contribute a
wildly disproportionate share of pages, so corpora cap documents per
registered domain (C4 and its descendants dedup by URL; RefinedWeb-style
pipelines filter and cap by domain).

Everything here is Column math over regexes — JVM whole-stage codegen, no
Python, and every expression has an exact DuckDB mirror so the operators
sit under the driver's rows+schema+hash oracle gate:

* :func:`normalize_url` — canonical URL: lowercase scheme+host, strip
  default ports (:80 http / :443 https), drop fragments, drop tracking
  parameters (``utm_*``, ``gclid``, ``fbclid``, ``ref``), sort surviving
  query parameters, strip trailing path slashes (non-root).
* :func:`registered_domain` — registrable-domain approximation from the
  host: last two labels, or last three when the host ends in a common
  second-level public suffix (``co.uk``-style grid). A full public-suffix
  list is a data file swap, not a design change.
* :func:`url_dedup` — keep-first per normalized URL.
* :func:`domain_caps` — rank documents within each registered domain and
  gate at ``max_per_domain``.

Scale notes (100 TB): normalization and domain extraction are zero-shuffle
projections. ``url_dedup`` shuffles once on the *normalized-URL hash* —
16-byte key plus the short normalized string, never page text; the window
partition per key is exactly the duplication multiplicity being measured.
``domain_caps`` shuffles once on the domain; a mega-domain (the
wordpress.com problem) concentrates its rows in one partition — the
documented upgrade is the two-phase split (count per domain map-side,
window only the over-cap domains, pass the long tail through without
sorting), which bounds window work to over-cap domains; the cap itself
then prunes those partitions to ``max_per_domain`` survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAM_PATTERN",
    "TWO_LEVEL_SUFFIX_PATTERN",
    "normalize_url",
    "registered_domain",
    "url_dedup",
    "domain_caps",
]

# A query parameter is tracking noise when its KEY is utm_* or one of the
# click identifiers. Matched against the full token: `key=value`, or a
# bare valueless `key` (crawls carry both spellings of the same tracker).
TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

# Common second-level public suffixes, as an (SLD grid x ccTLD grid)
# regex — an approximation of the public-suffix list that both engines
# evaluate identically.  Anchored at end-of-host by the callers.
TWO_LEVEL_SUFFIX_PATTERN = r"(co|com|org|net|ac|gov|edu)\.(uk|au|jp|in|br|nz|za|mx|ar|cn|id|tr)"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
# query = after the first '?' only when that '?' precedes any '#': a '?'
# inside the fragment ("/a#sec?x=1") is fragment content, not a query —
# an unanchored '\?([^#]*)' would resurrect it as canonical parameters.
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def _with_scheme(url):
    # Messy crawl data carries scheme-less URLs ("example.com/a"); without
    # this every such URL would parse to empty scheme/host/path and the
    # whole class would collapse into ONE ":///" dedup group (dropping all
    # but one document). Treat them as http, the crawler convention.
    return F.when(url.rlike(_SCHEME_RE), url).otherwise(F.concat(F.lit("http://"), url))


def _scheme(url):
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def _authority(url):
    return F.lower(F.regexp_extract(url, _AUTH_RE, 1))


def _host(url):
    # authority minus any port
    return F.regexp_replace(_authority(url), r":[0-9]+$", "")


def normalize_url(url_col) -> "F.Column":
    """Canonical form of a URL column (see module docstring for the rules).

    Pure Column math: regex part extraction + an array sort over the query
    parameters. Returns one string column; never touches Python.
    """
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    url = _with_scheme(url)
    scheme = _scheme(url)
    auth = _authority(url)
    auth = F.when(scheme == "http", F.regexp_replace(auth, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, r":443$", "")).otherwise(auth)
    )
    path = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(F.regexp_extract(url, _QUERY_RE, 1), "&"),
        lambda x: (x != F.lit("")) & ~x.rlike(TRACKING_PARAM_PATTERN),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def registered_domain(url_col) -> "F.Column":
    """Registrable domain of a URL column (last two host labels, or three
    over a second-level public suffix; the bare host when it has no dot).

    A trailing root-dot (``example.com.``) is stripped before the label
    logic, and an IPv4-literal host is its OWN domain — label suffixes of
    an address ("0.1") would lump every IP-hosted site into one cap group.
    """
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.regexp_replace(_host(_with_scheme(url)), r"\.$", "")
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    on_two_level = host.rlike(r"[^.]+\." + TWO_LEVEL_SUFFIX_PATTERN + "$")
    is_ipv4 = host.rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$")
    return F.when(is_ipv4, host).otherwise(
        F.when(on_two_level & (last3 != ""), last3).otherwise(
            F.when(last2 != "", last2).otherwise(host)
        )
    )


def url_dedup(docs: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, url_norm, group_size, keep) — keep-first per normalized URL.

    ``keep`` = 1 for the lowest ``id_col`` among the rows sharing a
    normalized URL, 0 for every later fetch of the same page.  The one
    shuffle partitions on a MATERIALIZED md5 of the normalized URL (the
    projection below runs before the exchange, so the raw ``url`` column —
    and everything else on ``docs`` — is pruned from the shuffle).
    """
    norm = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        normalize_url(url_col).alias("url_norm"),
    ).withColumn("_h", F.md5(F.col("url_norm")))
    w = Window.partitionBy("_h")
    return (
        norm.select(
            "doc_id",
            "url_norm",
            F.count(F.lit(1)).over(w).alias("group_size"),
            (F.row_number().over(w.orderBy("doc_id")) == 1).cast("long").alias("keep"),
        )
    )


def domain_caps(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_per_domain: int = 3,
) -> DataFrame:
    """(doc_id, domain, domain_docs, rank_in_domain, keep) — cap documents
    per registered domain, keeping the ``max_per_domain`` lowest ids.

    One shuffle on the domain string; only (doc_id, domain) cross it. See
    the module docstring for the over-cap/two-phase upgrade at mega-domain
    skew.
    """
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        registered_domain(url_col).alias("domain"),
    )
    w = Window.partitionBy("domain")
    rn = F.row_number().over(w.orderBy("doc_id"))
    return d.select(
        "doc_id",
        "domain",
        F.count(F.lit(1)).over(w).alias("domain_docs"),
        rn.alias("rank_in_domain"),
        (rn <= max_per_domain).cast("long").alias("keep"),
    )
