"""URL canonicalization — the front half of every crawl-curation
pipeline (and of :func:`~python_dtl_spark.operators.sampling.domain_quota`,
which caps per REGISTRABLE domain, not per raw url string).

Raw crawl URLs name the same resource many ways: scheme/host case,
default ports, trailing slashes, duplicate path separators, tracking
query parameters, fragments.  Canonicalizing before any dedup or
domain-capping step is what makes "same page" and "same site" joinable
keys.  The reference engine has no URL handling (its scalar registry is
``add`` only, ``/root/reference/src/dtl/functions.py``); this is an
extension operator per SURVEY.md §2.5.

Everything here is a pure map stage over JVM built-ins
(``try_parse_url`` + string/array functions — no Python in the row
path, no shuffle; plan-asserted in tests/test_plans.py), so it runs at
scan speed on 100 TB and Catalyst pushes surrounding filters straight
through it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that identify a tracking campaign, not a resource —
# the standard strip set (utm_* plus the Google/Facebook click ids)
_TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid)="

# second-level labels that act as public suffixes under a 2-letter
# ccTLD ("co.uk", "ac.jp", "com.au", ...).  A full registrable-domain
# rule is the Public Suffix List; this is the documented-approximation
# tier (exact for the generic TLDs plus the common ccTLD second levels,
# which is what crawl-side capping needs — swap in a PSL broadcast join
# for exactness).
_CC_SECOND_LEVELS = ("co", "com", "net", "org", "gov", "ac", "edu")

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _registrable_domain(host: Column) -> Column:
    """Last two host labels, or three when the second-to-last is a
    public-suffix-like second level under a 2-letter ccTLD."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last = F.element_at(labels, -1)
    second = F.element_at(labels, -2)
    three_part = (
        (n >= 3)
        & second.isin(*_CC_SECOND_LEVELS)
        & (F.length(last) == 2)
    )
    last2 = F.concat_ws(".", second, last)
    last3 = F.concat_ws(".", F.element_at(labels, -3), second, last)
    return F.when(n <= 1, host).when(three_part, last3).otherwise(last2)


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    strip_www: bool = True,
) -> DataFrame:
    """Append ``canonical_url``, ``host``, ``registrable_domain``.

    Canonical form, applied only to parseable http(s) URLs (anything
    else — junk rows, mailto:, data: — gets NULL in all three outputs,
    never a job failure):

    * scheme and host lowercased; one leading ``www.`` stripped from
      the host (``strip_www=False`` keeps it)
    * default ports dropped (``:80`` for http, ``:443`` for https);
      real ports kept
    * path: duplicate ``/`` collapsed, trailing ``/`` stripped, empty
      path becomes ``/`` (path CASE is preserved — paths are
      case-sensitive, unlike hosts)
    * query: tracking parameters removed (``utm_*``, ``gclid``,
      ``fbclid``), remaining parameters kept in original order (no
      re-sort: a#b=1&a=2 ordering can be semantic); emptied queries
      drop their ``?``
    * fragment dropped

    ``registrable_domain`` is the capping key for
    :func:`~python_dtl_spark.operators.sampling.domain_quota`: last two
    labels, or three under common ccTLD second levels (see
    ``_CC_SECOND_LEVELS`` for the exactness caveat).

    Output columns collide loudly (same contract as
    ``semistructured.json_extract_fields``).
    """
    out_cols = ("canonical_url", "host", "registrable_domain")
    clash = set(out_cols) & set(df.columns)
    if clash:
        raise ValueError(
            f"canonicalize_urls emits columns {sorted(clash)} which "
            "already exist on the input; rename or drop them first"
        )
    url = F.col(url_col)

    def part(p: str) -> Column:
        return F.expr(f"try_parse_url({url_col}, '{p}')")

    proto = F.lower(part("PROTOCOL"))
    host_raw = F.lower(part("HOST"))
    host = (
        F.regexp_replace(host_raw, r"^www\.", "") if strip_www else host_raw
    )
    # try_parse_url HOST excludes the port; AUTHORITY keeps it
    port = F.nullif(
        F.regexp_extract(part("AUTHORITY"), r":(\d+)$", 1), F.lit("")
    )
    default_port = (
        (proto == "http") & (port == _DEFAULT_PORTS["http"])
    ) | ((proto == "https") & (port == _DEFAULT_PORTS["https"]))
    port_part = F.when(
        port.isNotNull() & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))

    path = F.regexp_replace(part("PATH"), r"/{2,}", "/")
    path = F.regexp_replace(path, r"/$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    params = F.filter(
        F.split(part("QUERY"), "&"),
        lambda x: ~x.rlike(_TRACKING_PARAM_RE),
    )
    qs = F.array_join(params, "&")
    q_part = F.when(
        qs.isNotNull() & (qs != ""), F.concat(F.lit("?"), qs)
    ).otherwise(F.lit(""))

    valid = proto.isin("http", "https") & host.isNotNull() & (host != "")
    canonical = F.concat(proto, F.lit("://"), host, port_part, path, q_part)
    return (
        df.withColumn("canonical_url", F.when(valid, canonical))
        .withColumn("host", F.when(valid, host))
        .withColumn(
            "registrable_domain", F.when(valid, _registrable_domain(host))
        )
    )
