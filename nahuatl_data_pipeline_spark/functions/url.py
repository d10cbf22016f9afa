"""URL canonicalization and URL-key dedup — the web-crawl staple the
text-side dedup family (exact/minhash/simhash) sits on top of in a
crawl-scale pipeline: collapse re-crawls and tracking-parameter
variants of the same page BEFORE paying any content-hash or shingle
cost.

Beyond the reference (its sources are curated HF datasets with stable
ids, so it never needs this; the analogous id-construction is
``manager.py:17-21``'s sha256(url+ts) — which treats every tracked
variant as a distinct document, exactly the failure mode this module
removes).

Scale posture: ``canonicalize_url`` is a pure column expression —
regexp/split/array_sort codegen, zero Python hops, so it rides inside
whole-stage codegen on the scan. ``url_dedup`` is ONE shuffle on the
canonical key (window row_number, same contract as
``operators/dedup.py``); at 100 TB it is strictly cheaper than any
content dedup because the key is bytes of URL, not bytes of document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tracking parameters stripped by default: the query-string noise that
# makes one page crawl as many URLs. Matched against the full "k=v"
# token, anchored.
DEFAULT_TRACKING_PARAMS = (
    "utm_[a-z]+",
    "gclid",
    "fbclid",
    "msclkid",
    "mc_eid",
    "igshid",
    "ref",
)


def _tracking_regex(params: tuple[str, ...]) -> str:
    return "^(" + "|".join(params) + ")(=|$)"


def canonicalize_url(
    url: Column,
    *,
    drop_scheme: bool = False,
    tracking_params: tuple[str, ...] = DEFAULT_TRACKING_PARAMS,
) -> Column:
    """Canonical form of ``url`` as a pure Spark expression.

    Rules (each a standard crawl-dedup normalization):

    - trim surrounding whitespace, then TRUNCATE at the first interior
      whitespace character (raw whitespace cannot occur in a URL — RFC
      3986 — so everything after it is crawl junk; keeping it would
      also break idempotence: a later rule can expose new edge
      whitespace, e.g. ``'a /'`` → ``'a '``, found by hypothesis);
      strip the ``#fragment``;
    - lowercase the ``scheme://host[:port]`` prefix (path/query case is
      preserved — it is significant on most servers);
    - strip a leading ``www.`` and the scheme-default port
      (``:80`` for http, ``:443`` for https);
    - strip trailing slashes from the path;
    - drop tracking query parameters (``tracking_params``, matched
      against the ``k=v`` token), sort the survivors so parameter
      order cannot distinguish URLs, and drop the ``?`` when none
      survive;
    - ``drop_scheme=True`` additionally removes ``scheme://`` so that
      http/https re-crawls of the same page collapse.

    Scheme-less inputs (no ``://``): fragment/query/trailing-slash
    rules still apply; the host-specific rules (lowercase, ``www.``,
    default port) require an explicit scheme to locate the authority
    and are skipped — document ingestion should prepend one if its
    source emits bare authorities.
    """
    u = F.regexp_extract(F.trim(url), r"^(\S*)", 1)
    u = F.regexp_replace(u, r"#.*$", "")
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    query = F.regexp_extract(u, r"^[^?]*\?(.*)$", 1)

    # Authority prefix (scheme://host[:port]) normalized, path preserved.
    prefix = F.lower(
        F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/]*)", 1)
    )
    prefix = F.regexp_replace(prefix, r"^(https?://)www\.", "$1")
    prefix = F.regexp_replace(prefix, r"^(http://[^/:]+):80$", "$1")
    prefix = F.regexp_replace(prefix, r"^(https://[^/:]+):443$", "$1")
    if drop_scheme:
        prefix = F.regexp_replace(prefix, r"^[a-z][a-z0-9+.\-]*://", "")
    path = F.regexp_replace(
        base, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*", ""
    )
    path = F.regexp_replace(path, r"/+$", "")

    tracking_rx = _tracking_regex(tracking_params)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(tracking_rx),
        )
    )
    q = F.concat_ws("&", kept)
    return F.when(
        F.length(q) > 0, F.concat(prefix, path, F.lit("?"), q)
    ).otherwise(F.concat(prefix, path))


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    *,
    order_col: str | None = None,
    descending: bool = True,
    canon_col: str = "canonical_url",
    **canon_kwargs,
) -> DataFrame:
    """Keep ONE row per canonical URL.

    Winner per key: highest (``descending=True``) ``order_col`` —
    e.g. crawl timestamp for keep-latest or a quality score for
    keep-best — with the raw URL string as the deterministic
    tiebreak; with no ``order_col`` the lexically-smallest raw URL
    wins (pure function of the data, never of partitioning).

    Output keeps every input column plus ``canon_col``. One shuffle on
    the canonical key; the window is per-URL-family sized, so no key
    carries more rows than one page has crawl variants.

    Rows whose canonical key is NULL (NULL url) or empty (whitespace-only
    or fragment-only urls) pass through UNDEDUPLICATED: they are not one
    page's crawl variants, so collapsing them to a single survivor would
    silently drop documents in a pre-filter stage — and at scale a
    shared NULL/'' window key would funnel all junk rows through one
    task. They are filtered out of the window and unioned back.
    """
    out = df.withColumn(
        canon_col, canonicalize_url(F.col(url_col), **canon_kwargs)
    )
    no_key = F.col(canon_col).isNull() | (F.col(canon_col) == "")
    order = [F.col(url_col).asc()]
    if order_col is not None:
        lead = F.col(order_col).desc() if descending else F.col(order_col).asc()
        order = [lead, *order]
    w = Window.partitionBy(canon_col).orderBy(*order)
    deduped = (
        out.filter(~no_key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return deduped.unionByName(out.filter(no_key))


# Two-label public suffixes recognized by ``url_domain``. A full public
# suffix list is a runtime data file (publicsuffix.org) a production
# deployment would broadcast; this compile-time tuple covers the common
# ccTLD second-level registries and is the ONE definition shared by the
# Spark expression and every DuckDB oracle (the q22/q25 single-source
# pattern).
MULTI_LABEL_SUFFIXES = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "co.jp",
    "com.au",
    "com.br",
    "com.mx",
)


def multi_suffix_regex(
    suffixes: tuple[str, ...] = MULTI_LABEL_SUFFIXES,
) -> str:
    """Anchored regex matching a host whose public suffix spans two
    labels (so the registered domain spans three). Shared verbatim by
    ``url_domain`` and the oracle SQL mirrors."""
    return r"\.(" + "|".join(s.replace(".", r"\.") for s in suffixes) + ")$"


def url_domain(
    canonical: Column,
    *,
    suffixes: tuple[str, ...] = MULTI_LABEL_SUFFIXES,
) -> Column:
    """Registered domain (eTLD+1 approximation) of a CANONICAL url.

    Pure column expression (regexp codegen, no Python hop):

    - host = authority of ``canonical`` minus userinfo (everything up
      to the LAST ``@`` per RFC 3986 — greedy is safe because the
      authority extract already excludes ``/?#``) and port —
      ``canonicalize_url`` already lowercased it and stripped ``www.``
      for http(s); a leading ``www.`` from any other scheme is
      stripped here;
    - registered domain = last two host labels, or last three when the
      host ends in a two-label public suffix from ``suffixes``
      (``bbc.co.uk`` stays ``bbc.co.uk``, ``media.example.co.uk`` →
      ``example.co.uk``); a trailing FQDN dot (``example.com.``) is
      stripped first;
    - an IPv4 literal has no registered domain and is returned whole
      (the last-two-labels cut would yield nonsense like ``0.1``);
      any ``[``-bracketed literal (IPv6, including dotted forms like
      ``[::ffff:192.168.0.1]``) is returned whole before the label
      cuts; other dot-less hosts (``localhost``) are returned whole;
      NULL/empty canonical urls yield NULL (junk rows group under one
      NULL domain — safe for aggregation because every downstream stat
      is a decomposable partial aggregate, unlike the window key in
      ``url_dedup``).
    """
    host = F.regexp_extract(canonical, r"^[a-z][a-z0-9+.\-]*://([^/?#]+)", 1)
    host = F.regexp_replace(host, r"^.*@", "")  # userinfo (to last '@')
    # Port strip is bracket-safe: '[::1]:8080' → '[::1]', and a bare
    # bracketed literal ends in ']' so the anchored regex cannot bite
    # into the address body.
    host = F.regexp_replace(host, r":[0-9]*$", "")  # port
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r"\.$", "")  # FQDN trailing dot
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    sfx = multi_suffix_regex(suffixes)
    return (
        F.when(host.isNull() | (host == ""), F.lit(None).cast("string"))
        .when(host.rlike(r"^\["), host)  # bracketed IPv6 literal
        .when(host.rlike(r"^[0-9]+(\.[0-9]+){3}$"), host)  # IPv4 literal
        .when(host.rlike(sfx) & (last3 != ""), last3)
        .when(last2 != "", last2)
        .otherwise(host)
    )
