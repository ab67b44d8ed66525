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

from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that identify a tracking campaign, not a resource —
# the standard strip set (utm_* plus the Google/Facebook click ids)
_TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid)="

# second-level labels that act as public suffixes under a 2-letter
# ccTLD ("co.uk", "ac.jp", "com.au", ...).  A full registrable-domain
# rule is the Public Suffix List; this is the zero-data approximation
# tier (exact for the generic TLDs plus the common ccTLD second levels,
# which is what crawl-side capping needs).  The exactness tier is
# :func:`registrable_domains_psl` below — the full PSL algorithm over
# the checked-in fixtures/public_suffix_snapshot.dat broadcast.
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

    **IDN scope decision (documented, not a gap):** hosts are treated
    as the bytes the crawl handed over — lowercased but NOT
    punycode-normalized, so a raw-unicode host (``münchen.de``) and
    its IDNA/punycode encoding (``xn--mnchen-3ya.de``) remain DISTINCT
    capping keys (pinned in tests/test_operators.py).  Rationale:
    conformant crawlers emit the wire format (punycode — a URL is only
    fetchable in its IDNA form), so mixed representations of one site
    indicate a non-conformant source, and folding them requires the
    full IDNA/UTS-46 mapping table (Spark has no built-in; shipping a
    partial mapping would silently merge or split hosts the real
    algorithm would not).  Callers that ingest raw-unicode URL corpora
    should IDNA-encode hosts upstream, where the proper library
    exists.

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
        # native API, not string-built F.expr: a dotted or otherwise
        # non-identifier column name would misresolve inside SQL text
        return F.try_parse_url(url, F.lit(p))

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


# --------------------------------------------------------------------------
# PSL-exact registrable domains — the exactness tier _registrable_domain's
# docstring promises.  The rules ship as a checked-in snapshot of the
# Public Suffix List (publicsuffix.org, reduced subset; see the fixture
# file header) and resolution implements the full PSL algorithm:
# longest prevailing rule wins, "*." wildcard rules, "!" exception
# rules, and the implicit "*" default (unknown TLD = public suffix).
# --------------------------------------------------------------------------

_PSL_SNAPSHOT = (
    Path(__file__).resolve().parent.parent / "fixtures" / "public_suffix_snapshot.dat"
)


def load_psl_snapshot(path: str | Path | None = None) -> list[tuple[str, str, int]]:
    """Parse a publicsuffix.org-format rules file into
    ``(match_key, kind, n_labels)`` tuples.

    ``match_key`` is the rule with any ``*.`` / ``!`` marker stripped
    and lowercased — the equi-join key a host's label-suffix candidates
    probe.  ``kind`` is ``plain`` / ``wildcard`` / ``exception``;
    ``n_labels`` is the label count of ``match_key``.  The public
    suffix a matching rule asserts is ``n_labels`` labels for plain,
    ``n_labels + 1`` for wildcard (the ``*`` consumes one host label),
    and ``n_labels - 1`` for exception (the exception EXEMPTS its host
    from the wildcard one level up).
    """
    raw = Path(path or _PSL_SNAPSHOT).read_text(encoding="utf-8")
    rules: list[tuple[str, str, int]] = []
    for line in raw.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        # the publicsuffix.org format defines a rule as everything up
        # to the first whitespace — upstream lines may carry trailing
        # annotations that are not part of the rule
        line = line.split()[0]
        if line.startswith("!"):
            kind, key = "exception", line[1:]
        elif line.startswith("*."):
            kind, key = "wildcard", line[2:]
        else:
            kind, key = "plain", line
        key = key.lower()
        rules.append((key, kind, key.count(".") + 1))
    if not rules:
        raise ValueError(f"no rules parsed from PSL snapshot {path or _PSL_SNAPSHOT}")
    return rules


def registrable_domains_psl(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "psl_domain",
    rules: list[tuple[str, str, int]] | None = None,
) -> DataFrame:
    """Append ``out_col``: the PSL-exact registrable domain of
    ``host_col`` (NULL when the host IS a public suffix, or is NULL).
    Always lowercase — hosts are case-insensitive, so mixed-case raw
    crawl hosts resolve to one canonical capping key.

    Resolution replays the Public Suffix List algorithm relationally —
    no per-row Python:

    1. distinct hosts (crawl hosts repeat heavily, so every later step
       runs at distinct-host grain, sub-linear in corpus rows);
    2. each host emits its label-suffix candidates (at most
       ``max(rule label count)`` per host, ~5) and equi-joins the
       BROADCAST rules table — never a scan-by-scan nested loop;
    3. the prevailing rule aggregates per host: any matching exception
       rule wins outright, else the longest plain/wildcard match, else
       the implicit ``*`` default (public suffix = the TLD);
    4. registrable domain = public suffix + one label; resolved hosts
       join back to the input on the host key.

    Scale shape: ONE exchange at distinct-host grain (the distinct;
    the prevailing-rule max reuses its partitioning — candidate
    fan-out is a bounded ×max_rule_labels of NARROW (host, candidate)
    rows, combined map-side by the max aggregate) plus the final
    corpus join on host, which AQE broadcasts whenever the resolved
    table is small.  The implicit-default rule and the label slice
    evaluate ROW-LOCALLY on the corpus side, so hosts without a
    matching rule never materialize an intermediate.

    The reference engine has no URL handling (scalar registry is
    ``add`` only, ``/root/reference/src/dtl/functions.py``); extension
    per SURVEY.md §2.5.
    """
    if out_col in df.columns:
        raise ValueError(
            f"registrable_domains_psl emits column {out_col!r} which "
            "already exists on the input; rename or drop it first"
        )
    for tmp in ("__h", "__exc", "__reg"):
        if tmp in df.columns:
            raise ValueError(
                f"registrable_domains_psl uses reserved column {tmp!r}"
            )
    spark = df.sparkSession
    parsed = rules if rules is not None else load_psl_snapshot()
    if not parsed:
        raise ValueError("rules is empty; pass None to use the snapshot")
    max_k = max(k for _, _, k in parsed)
    rules_df = spark.createDataFrame(
        parsed, "match_key string, kind string, k int"
    )
    # hosts are case-insensitive and rule keys ship lowercased, so the
    # candidate labels lower before probing — a raw-crawl
    # 'WWW.Example.CO.UK' must match 'co.uk', not fall through to the
    # implicit '*' default.  out_col is therefore always lowercase.
    labels = F.split(F.lower(F.col("__h")), r"\.")
    hostsp = (
        df.select(F.col(host_col).alias("__h"))
        .where(F.col("__h").isNotNull())
        .distinct()
        .select("__h", labels.alias("__l"), F.size(labels).alias("__n"))
    )
    cand = hostsp.select(
        "__h",
        "__n",
        F.explode(
            F.sequence(F.lit(1), F.least(F.col("__n"), F.lit(max_k)))
        ).alias("__k"),
        "__l",
    ).select(
        "__h",
        "__n",
        F.array_join(
            F.slice(F.col("__l"), F.col("__n") - F.col("__k") + 1, F.col("__k")),
            ".",
        ).alias("__cand"),
    )
    # wildcard rules assert a suffix one label LONGER than their match
    # key, so they only apply when the host actually has that label
    matched = cand.join(
        F.broadcast(rules_df),
        (F.col("__cand") == F.col("match_key"))
        & ((F.col("kind") != "wildcard") | (F.col("__n") > F.col("k"))),
        "inner",
    )
    resolved = matched.groupBy("__h").agg(
        F.max(F.when(F.col("kind") == "exception", F.col("k") - 1)).alias("__exc"),
        F.max(
            F.when(F.col("kind") == "plain", F.col("k")).when(
                F.col("kind") == "wildcard", F.col("k") + 1
            )
        ).alias("__reg"),
    )
    # the default rule and the label slice are row-local on the CORPUS
    # side: hosts with no matching rule (implicit '*' — public suffix
    # is the TLD) simply miss the left join and fall to ps = 1, so the
    # resolved table carries only rule-matched hosts and no second
    # host-grain join is ever needed
    hlabels = F.split(F.lower(F.col(host_col)), r"\.")
    hn = F.size(hlabels)
    ps = F.coalesce(F.col("__exc"), F.col("__reg"), F.lit(1))
    return (
        df.join(resolved, F.col(host_col) == F.col("__h"), "left")
        .withColumn(
            out_col,
            F.when(
                F.col(host_col).isNotNull() & (hn > ps),
                F.array_join(F.slice(hlabels, hn - ps, ps + F.lit(1)), "."),
            ),
        )
        .drop("__h", "__exc", "__reg")
    )


#: Conservative outlink matcher, Java-regex/RE2-common (the pii_scrub
#: convention — no lookaround/backreferences): an http(s) scheme
#: followed by everything up to whitespace or a character that
#: overwhelmingly means "the sentence resumed" (quote, bracket, angle).
#: Whitespace is the EXPLICIT class, not ``\s`` — Java's ``\s``
#: includes ``\x0B`` while RE2's does not (the html_to_text VT
#: lesson), and this regex must extract byte-identically in both.
URL_RE = r"""https?://[^ \t\n\r\f\x0B<>"'\)\]\}]+"""

#: Trailing sentence punctuation stripped AFTER matching ('see
#: https://a.com/x.' — the dot belongs to the prose, not the path).
URL_TRAIL_RE = r"[.,;:!?]+$"


def extract_urls(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """Outlink extraction — the link-graph front half every crawl
    pipeline runs: pull every http(s) URL out of free text, one output
    row per occurrence (``(id, url)``; duplicates per doc preserved —
    an outlink census weights repeated links, dedupe downstream if
    not).  Trailing sentence punctuation is stripped from each match
    (documented in ``URL_TRAIL_RE``); rows with a NULL id or text are
    excluded; docs with no URL emit nothing (LEFT-join back for a
    zero-count census).

    Deliberately a FIXED REGEX (Java/RE2-common, the ``pii_scrub``
    convention), not a parser: engine-exact and DuckDB-replayable.
    Composes with :func:`canonicalize_urls` →
    ``registrable_domains_psl`` → ``sampling.domain_quota`` for the
    full outlink-census / link-spam-cap chain.

    Scale shape: row-local ``regexp_extract_all`` + explode — zero
    Exchange, zero Python (``test_extract_urls_is_pure_map``)."""
    qid = df["`{}`".format(id_col.replace("`", "``"))]
    qt = df["`{}`".format(text_col.replace("`", "``"))]
    return (
        df.filter(qid.isNotNull() & qt.isNotNull())
        .select(
            qid.alias(id_col),
            F.explode(
                F.regexp_extract_all(qt, F.lit(URL_RE), F.lit(0))
            ).alias("__xu"),
        )
        .select(
            id_col,
            F.regexp_replace(F.col("__xu"), URL_TRAIL_RE, "").alias(url_col),
        )
    )
