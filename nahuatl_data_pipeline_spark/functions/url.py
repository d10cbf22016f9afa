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


# Two-label public suffixes recognized by ``url_domain``. The DEFAULT
# stays this compile-time tuple — it is the ONE definition shared by
# the Spark expression and every DuckDB oracle (the q22/q25
# single-source pattern; q164's oracle pins it). Deployments that need
# full publicsuffix.org coverage (``blogspot.co.uk`` etc.) load the PSL
# data file and use :func:`url_domain_psl` — a broadcast-join variant
# whose rule table is runtime data, which is exactly why it is NOT the
# oracle default (divergence policy: oracle-certified queries pin the
# literal tuple; the PSL variant is covered by unit tests against
# hand-computed registered domains).
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


def parse_public_suffix_list(text: str) -> dict[str, list[str]]:
    """Parse publicsuffix.org list data into rule groups.

    Returns ``{"exact": [...], "wildcard": [...], "exception": [...]}``
    where wildcard entries are the BASE (``*.ck`` → ``ck``) and
    exception entries drop the ``!`` (``!www.ck`` → ``www.ck``).
    Comments (``//``), blank lines, and anything after whitespace on a
    rule line are ignored, per the published format. Rules are
    lowercased (hosts are already lowercase post-canonicalization).

    IDN rules: the real publicsuffix.org file carries ~1k Unicode rules
    (``xn--``-less forms like ``中国``). Canonicalized hosts are
    ASCII/punycode, so a Unicode rule as-written can never match — each
    non-ASCII label is therefore punycode-encoded here at parse time via
    the stdlib ``idna`` codec (IDNA2003; a handful of labels where
    UTS46 differs — e.g. sharp-s ``ß`` — may encode differently from
    the registry's own punycode, and labels the codec rejects are kept
    verbatim, i.e. unmatchable, exactly the pre-encoding behavior).
    """

    def _to_ascii(rule: str) -> str:
        if rule.isascii():
            return rule
        out = []
        for label in rule.split("."):
            if label.isascii():
                out.append(label)
            else:
                try:
                    out.append(label.encode("idna").decode("ascii"))
                except UnicodeError:
                    out.append(label)  # unmatchable, documented above
        return ".".join(out)

    exact: list[str] = []
    wildcard: list[str] = []
    exception: list[str] = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        # classify BEFORE punycoding: on a Unicode first label the
        # idna codec would swallow a leading "!" into the encoded
        # label ("!中国" → "xn--!-…"), silently turning an exception
        # rule into an unmatchable exact rule
        rule = line.split()[0].lower()
        if rule.startswith("!"):
            exception.append(_to_ascii(rule[1:]))
        elif rule.startswith("*."):
            wildcard.append(_to_ascii(rule[2:]))
        elif rule != "*":  # the implicit default rule is built in
            exact.append(_to_ascii(rule))
    return {"exact": exact, "wildcard": wildcard, "exception": exception}


def load_public_suffix_list(path: str) -> dict[str, list[str]]:
    """``parse_public_suffix_list`` over a file on the driver's disk
    (the PSL is a ~240 KB data file — driver-side read, then broadcast
    by :func:`url_domain_psl`)."""
    with open(path, encoding="utf-8") as f:
        return parse_public_suffix_list(f.read())


def url_domain_psl(
    df: DataFrame,
    canonical_col: str,
    rules: dict[str, list[str]],
    out_col: str = "domain",
    max_rule_labels: int | None = None,
) -> DataFrame:
    """Registered domain (eTLD+1) per the FULL public-suffix algorithm,
    as a chain of BROADCAST hash joins — the scale path next to
    :func:`url_domain`'s literal-tuple expression.

    Publicsuffix.org semantics: the public suffix of a host is its
    longest matching rule (a ``*.base`` wildcard matches one extra
    label; a ``!exc`` exception UN-suffixes its match, making the
    suffix one label shorter); an unmatched host falls to the implicit
    ``*`` rule (suffix = last label). The registered domain is the
    suffix plus one label; a host that IS a public suffix has none
    (NULL here — callers like the per-domain cap already junk-key NULL
    domains per row).

    Scale shape: the rule table (~9k rows parsed from a ~240 KB file)
    is split by label count into ≤ ``max_rule_labels`` tiny frames,
    each BROADCAST left-joined against the host's last-k-labels slice —
    every join is map-side (zero shuffle, no explode/groupBy re-shuffle
    of the corpus), so the operator composes into the crawl head
    stages without adding an exchange. IPv4/bracketed-IPv6 literals
    short-circuit exactly as in :func:`url_domain`; dot-less hosts do
    NOT — ``url_domain`` returns them whole (``localhost`` →
    ``localhost``) while here they fall to the implicit ``*`` rule,
    ARE the one-label public suffix, and yield NULL (PSL-correct;
    pinned in tests/test_url.py). Consequence for the per-domain cap
    (``url_head_stages``): a NULL domain gets a per-row junk key and is
    never capped, so toggling ``psl_rules`` on exempts dot-less hosts
    from the cap.

    Divergence from strict publicsuffix.org semantics (deliberate —
    the engine's www-equivalence canonicalization): a leading ``www.``
    is stripped from the host BEFORE rule matching, so a host that is
    exactly ``www.<base>`` under a ``!www.<base>`` exception rule
    reduces to the bare ``<base>`` and the exception can never fire —
    bare ``www.ck`` yields NULL here where strict PSL would call it a
    registrable domain. Multi-label hosts under the exception
    (``shop.www.ck``) are unaffected. No certified dataset plants bare
    exception hosts, so q171's hash certification is indifferent to
    this choice; the engine's answer is pinned in tests/test_url.py.

    Tested against hand-computed registered domains for exact,
    wildcard, exception, PSL-only (``blogspot.co.uk``) and
    unknown-TLD hosts in tests/test_url.py.
    """
    longest = max(
        (r.count(".") + 1 for rs in rules.values() for r in rs),
        default=1,
    )
    if max_rule_labels is None:
        max_rule_labels = longest  # never silently drop a rule
    elif longest > max_rule_labels:
        # an ignored rule would silently mis-fold every host under it
        raise ValueError(
            f"rule with {longest} labels exceeds max_rule_labels="
            f"{max_rule_labels}; raise the bound or prune the rules"
        )
    spark = df.sparkSession
    host = F.regexp_extract(
        F.col(canonical_col), r"^[a-z][a-z0-9+.\-]*://([^/?#]+)", 1
    )
    host = F.regexp_replace(host, r"^.*@", "")
    host = F.regexp_replace(host, r":[0-9]*$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r"\.$", "")
    out = df.withColumn("__host", host).withColumn(
        "__labels", F.split(F.col("__host"), r"\.")
    )
    n_labels = F.size(F.col("__labels"))

    def last_k(k: int):
        return F.array_join(F.slice(F.col("__labels"), -k, k), ".")

    # ONE tiny broadcast frame per label count, all three rule kinds
    # folded in as boolean flag columns (r13 verdict task #7: the old
    # per-(kind, k) split broadcast up to three frames per k and ran up
    # to three joins where one suffices — every k's joins share the
    # identical join key, last_k(k)). Rule strings are distinct per
    # frame, so each left join still matches at most one row: the join
    # multiplicity, and therefore the output, is unchanged; only the
    # number of BroadcastHashJoins drops.
    by_k: dict[int, dict[str, list[bool]]] = {}
    for kind_idx, kind in enumerate(("exact", "wildcard", "exception")):
        for r in rules.get(kind, []):
            k = r.count(".") + 1
            if k <= max_rule_labels:
                flags = by_k.setdefault(k, {}).setdefault(
                    r, [False, False, False]
                )
                flags[kind_idx] = True

    # suffix length contributed by a match at candidate length k:
    #   exact rule of k labels      -> k
    #   wildcard base of k labels   -> k + 1 (needs one extra label)
    #   exception rule of k labels  -> k - 1 (override, handled below)
    suffix_len = F.lit(1)  # implicit "*" default rule
    exc_len = F.lit(None).cast("int")
    for k, rulemap in sorted(by_k.items()):
        tiny = spark.createDataFrame(
            [
                (r, fl[0], fl[1], fl[2])
                for r, fl in sorted(rulemap.items())
            ],
            f"__rule_{k} string, __e_{k} boolean, "
            f"__w_{k} boolean, __x_{k} boolean",
        )
        out = out.join(
            F.broadcast(tiny), last_k(k) == F.col(f"__rule_{k}"), "left"
        ).drop(f"__rule_{k}")
        # flag columns are NULL on no-match — falsy inside when(), same
        # decision the old isNotNull() flags produced
        if any(fl[0] for fl in rulemap.values()):
            suffix_len = F.greatest(
                suffix_len,
                F.coalesce(F.when(F.col(f"__e_{k}"), F.lit(k)), F.lit(1)),
            )
        if any(fl[1] for fl in rulemap.values()):
            suffix_len = F.greatest(
                suffix_len,
                F.coalesce(
                    F.when(
                        F.col(f"__w_{k}") & (n_labels >= k + 1),
                        F.lit(k + 1),
                    ),
                    F.lit(1),
                ),
            )
        # exception override: if any exception rule matched, the public
        # suffix is the exception minus its first label (k - 1); ks
        # ascend, so the coalesce order matches the old sorted loop
        if any(fl[2] for fl in rulemap.values()):
            exc_len = F.coalesce(
                exc_len, F.when(F.col(f"__x_{k}"), F.lit(k - 1))
            )
    s = F.coalesce(exc_len, suffix_len)

    reg = F.when(n_labels > s, F.array_join(
        F.slice(F.col("__labels"), -(F.lit(0) + s + 1).cast("int"), (F.lit(0) + s + 1).cast("int")), "."
    ))
    domain = (
        F.when(F.col("__host").isNull() | (F.col("__host") == ""),
               F.lit(None).cast("string"))
        .when(F.col("__host").rlike(r"^\["), F.col("__host"))
        .when(F.col("__host").rlike(r"^[0-9]+(\.[0-9]+){3}$"), F.col("__host"))
        .otherwise(reg)
    )
    drop_cols = ["__host", "__labels"] + [
        f"__{c}_{k}" for k in by_k for c in ("e", "w", "x")
    ]
    return out.withColumn(out_col, domain).drop(*drop_cols)
