"""Domain-level crawl curation (north-star extension): the per-domain
stage every web-corpus pipeline runs between ingest (sources/warc.py)
and document-level filtering — domain frequency statistics and
deterministic per-domain caps (C4 capped pages per host; RefinedWeb
dedups and rebalances by registered domain).

Everything is expression-level: ``parse_url`` for the host (JVM-side,
same java.net.URI semantics a crawler used to emit the URLs), a
label-array suffix match for the registered domain, window row_number
for the cap.  One shuffle per operator, keyed by domain — cardinality
≪ documents, and the cap's window needs no global sort.

Registered-domain honesty: the real rule set is the public-suffix
list (a ~10k-entry published dataset this offline container does not
carry, so the BUILT-IN default is a common-suffix slice).
``registered_domain_col`` accepts the full PSL rule FORMAT — plain,
wildcard (``*.ck``) and exception (``!www.ck``) rules — and applies
the published matching algorithm (r12 verdict order #3); a deployment
passes the real PSL's entries and the operator shape (and the
cap/stats built on it) does not change.  Pinned against the PSL
algorithm's published examples and a pure-Python reference in
tests/test_crawl.py."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# common 2-label public suffixes — a stand-in slice of the PSL; pass
# the full list's 2-label entries for production
DEFAULT_2LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "co.nz",
)


def url_host_col(url: Column) -> Column:
    """Lower-cased host of a URL — ``try_parse_url``, because a crawl's
    URL column always contains garbage and an unparseable URL must be a
    null host (groupable, cappable, auditable), never a failed task."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


# tracking parameters every canonicalizer strips (the common public
# list: Google/Facebook/Microsoft click ids + the utm_* campaign family)
DEFAULT_TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "igshid", "mc_eid")
DEFAULT_TRACKING_PREFIXES = ("utm_",)


def _pct_norm(s: Column) -> Column:
    """RFC 3986 §6.2.2-6.2.3 percent-encoding normalization of one URL
    component: decode percent-encodings of UNRESERVED characters
    (%41 → A, %7E → ~), uppercase the hex of everything else
    (%2f → %2F), re-emit invalid escapes verbatim.  Pure expressions:
    split on '%', fix each tail piece, rejoin."""
    parts = F.split(s, "%")

    def fix(p: Column) -> Column:
        hexs = F.substring(p, 1, 2)
        # length-safe remainder (no fixed cap): a fixed third argument
        # would silently truncate a pathological multi-MiB component and
        # corrupt its canonical key instead of passing it through
        rest = F.substr(p, F.lit(3))
        valid = hexs.rlike("^[0-9A-Fa-f]{2}$")
        ch = F.char(F.conv(hexs, 16, 10).cast("long"))
        unres = ch.rlike("^[A-Za-z0-9._~-]$")
        return (
            F.when(~valid, F.concat(F.lit("%"), p))
            .when(unres, F.concat(ch, rest))
            .otherwise(F.concat(F.lit("%"), F.upper(hexs), rest))
        )

    tail = F.array_join(
        F.transform(F.slice(parts, 2, F.greatest(F.size(parts), F.lit(1))), fix),
        "",
    )
    return F.when(F.size(parts) <= 1, s).otherwise(
        F.concat(F.element_at(parts, 1), tail)
    )


def canonical_url_col(
    url: Column,
    drop_params: tuple[str, ...] = DEFAULT_TRACKING_PARAMS,
    drop_prefixes: tuple[str, ...] = DEFAULT_TRACKING_PREFIXES,
) -> Column:
    """Canonical form of a URL — the key URL-level dedup and crawl
    frontier de-queueing actually use (two crawls of the same page
    differ by tracking params and fragments far more often than by
    content).  RFC 3986 syntax-based normalization plus the standard
    pragmatic rules, all as one JVM-side expression chain:

    - scheme and host lowercase; userinfo (credentials) dropped
    - fragment dropped
    - default ports stripped (``:80`` for http, ``:443`` for https);
      other explicit ports kept
    - empty path becomes ``/``
    - percent-encoding normalization (RFC 3986 §6.2.2) on path and
      query terms: unreserved characters decode (%7E → ~), remaining
      hex uppercases (%2f → %2F), invalid escapes pass verbatim —
      applied BEFORE the tracking filter so ``utm%5Fsource``
      still drops
    - query: tracking parameters removed (names in ``drop_params`` or
      starting with a ``drop_prefixes`` entry), remaining ``k=v`` terms
      byte-sorted for order-independence, empty terms dropped; an
      emptied query loses its ``?``
    - an unparseable URL (no host) canonicalizes to NULL — groupable
      and auditable, never a failed task

    Pinned against a pure-Python reference implementing the identical
    rules in tests/test_crawl.py; compose with ``dedup_exact``-style
    keep-min grouping for URL-level dedup, or feed ``with_domain`` the
    canonical column."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    authority = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when((port == "") | default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(
        _pct_norm(path)
    )
    query = F.try_parse_url(url, F.lit("QUERY"))

    def _keep(p: Column) -> Column:
        name = F.split_part(p, F.lit("="), F.lit(1))
        cond = p != ""
        if drop_params:
            cond = cond & ~name.isin(*drop_params)
        for pre in drop_prefixes:
            cond = cond & ~name.startswith(pre)
        return cond

    kept = F.array_sort(
        F.filter(
            F.transform(
                F.split(F.coalesce(query, F.lit("")), "&"), _pct_norm
            ),
            _keep,
        )
    )
    return F.when(
        host.isNull() | scheme.isNull() | (scheme == ""), F.lit(None)
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            port_part,
            path,
            F.when(
                F.size(kept) > 0,
                F.concat(F.lit("?"), F.array_join(kept, "&")),
            ).otherwise(F.lit("")),
        )
    )


def dedup_by_canonical_url(
    df: DataFrame,
    url_col: str = "target_uri",
    id_col: str = "doc_id",
    drop_params: tuple[str, ...] = DEFAULT_TRACKING_PARAMS,
    drop_prefixes: tuple[str, ...] = DEFAULT_TRACKING_PREFIXES,
    tiebreak_cols: tuple[str, ...] = (),
    canon_col: str | None = None,
) -> DataFrame:
    """URL-level dedup: keep ONE row per canonical URL (the smallest
    ``id_col`` — deterministic), so re-fetches that differ only by
    tracking params / fragments / case collapse before any text-level
    stage runs.  One window keyed by the canonical URL; rows whose URL
    does not canonicalize (null) pass through on row-unique fallback
    keys — the same no-skew posture as cap_per_domain.  Output: the
    surviving input rows, columns unchanged.

    ``tiebreak_cols`` extend the window order AFTER ``id_col`` so the
    survivor stays deterministic even when two rows share an id (e.g. a
    64-bit hash collision between distinct fetches — without a tiebreak
    the row_number between them is partition-order luck).
    ``canon_col`` names an already-computed canonical-URL column to key
    on (null = unparseable) instead of re-deriving it here — composite
    pipelines canonicalize each URL exactly once."""
    from pyspark.sql import Window

    canon = (
        F.col(canon_col)
        if canon_col is not None
        else canonical_url_col(F.col(url_col), drop_params, drop_prefixes)
    )
    key = F.coalesce(
        canon,
        F.concat_ws(
            "-",
            F.lit("nocanon"),
            F.monotonically_increasing_id().cast("string"),
        ),
    )
    order = [F.col(id_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("_url_rank", F.row_number().over(w))
        .where(F.col("_url_rank") == 1)
        .drop("_url_rank")
    )


def registered_domain_col(
    host: Column, suffixes: tuple[str, ...] = DEFAULT_2LABEL_SUFFIXES
) -> Column:
    """Registered domain from a host by the published Public Suffix
    List algorithm (publicsuffix.org/list/) over ``suffixes``, which
    accepts the PSL rule FORMAT: plain rules (``co.uk``), wildcard
    rules (``*.ck`` — any single label under .ck is a public suffix),
    and exception rules (``!www.ck`` — www.ck is registrable despite a
    covering wildcard).  Matching follows the documented algorithm:
    exception rules prevail over everything (the registered domain IS
    the exception), otherwise the matching rule with the most labels
    wins, and an unlisted TLD falls back to the implicit ``*`` rule
    (public suffix = the last label).  The registered domain is the
    public suffix plus one label; a host that IS a public suffix (or a
    bare 1-label host) passes through unchanged.

    Pure array expressions over the split host — the per-row work is a
    handful of set-membership checks against literal arrays, so keep
    the rule set filter-sized (the full PSL's ~10k entries embed fine;
    a rule set beyond that belongs in a broadcast join).  Pinned
    against the PSL algorithm's published examples (wildcard,
    exception, unlisted TLD) in tests/test_crawl.py."""
    normals: list[str] = []
    wild_bases: list[str] = []
    exceptions: list[str] = []
    for s in suffixes:
        if s.startswith("!"):
            exceptions.append(s[1:])
        elif s.startswith("*."):
            wild_bases.append(s[2:])
        else:
            normals.append(s)
    ls = F.split(host, r"\.")
    n = F.size(ls)

    def last_k(k: int) -> Column:
        return F.concat_ws(
            ".", *[F.element_at(ls, -i) for i in range(k, 0, -1)]
        )

    def labels(s: str) -> int:
        return s.count(".") + 1

    # public-suffix LENGTH: the implicit '*' rule contributes 1; a
    # k-label normal rule contributes k; a k-label wildcard base
    # contributes k+1 (the wildcard consumes one more label)
    contribs: list[Column] = [F.lit(1)]
    for k in sorted({labels(s) for s in normals}):
        nk = [s for s in normals if labels(s) == k]
        contribs.append(
            F.when((n >= k) & F.array_contains(
                F.array(*[F.lit(s) for s in nk]), last_k(k)
            ), F.lit(k)).otherwise(F.lit(0))
        )
    for k in sorted({labels(s) for s in wild_bases}):
        wk = [s for s in wild_bases if labels(s) == k]
        contribs.append(
            F.when((n >= k + 1) & F.array_contains(
                F.array(*[F.lit(s) for s in wk]), last_k(k)
            ), F.lit(k + 1)).otherwise(F.lit(0))
        )
    pub = F.greatest(*contribs) if len(contribs) > 1 else contribs[0]

    # exception rules: if one matches as a suffix, the registered
    # domain is the exception itself (PSL: strip the exception's
    # leftmost label to get the public suffix, then add one back)
    exc: Column = F.lit(None).cast("string")
    for s in sorted(exceptions, key=labels):  # longest checked LAST wins
        k = labels(s)
        exc = F.when((n >= k) & (last_k(k) == s), F.lit(s)).otherwise(exc)

    return (
        F.when(host.isNull() | (n <= 1), host)
        .when(exc.isNotNull(), exc)
        .when(n <= pub, host)  # the host IS a public suffix
        .otherwise(F.array_join(F.slice(ls, n - pub, pub + F.lit(1)), "."))
    )


def with_url_parts(
    df: DataFrame,
    url_col: str = "target_uri",
    drop_params: tuple[str, ...] = DEFAULT_TRACKING_PARAMS,
    drop_prefixes: tuple[str, ...] = DEFAULT_TRACKING_PREFIXES,
) -> DataFrame:
    """The input relation plus ``canonical_url`` and ``host`` — ONE
    projection holding the funnel's single try_parse_url family for a
    URL column.  A composed pipeline (corpus_prep) derives both here
    and threads them to the URL-dedup window (``canon_col=``) and the
    domain stages (``host_col=``), so each URL parses once instead of
    once per stage; the HOST part is shared between the two expressions
    and whole-stage codegen's subexpression elimination evaluates it a
    single time per row."""
    return df.withColumn(
        "canonical_url",
        canonical_url_col(F.col(url_col), drop_params, drop_prefixes),
    ).withColumn("host", url_host_col(F.col(url_col)))


def with_domain(
    df: DataFrame,
    url_col: str = "target_uri",
    suffixes: tuple[str, ...] = DEFAULT_2LABEL_SUFFIXES,
    host_col: str | None = None,
) -> DataFrame:
    """The input relation plus ``host`` and ``domain`` columns — the
    shared projection of the stats and cap operators.  ``host_col``
    names an already-computed host column (with_url_parts) so a
    composite pipeline skips the re-parse; the domain derivation is the
    same pure array-expression suffix match either way."""
    if host_col is None:
        df = df.withColumn("host", url_host_col(F.col(url_col)))
        host_col = "host"
    return df.withColumn(
        "domain", registered_domain_col(F.col(host_col), suffixes)
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "target_uri",
    text_col: str | None = "text",
    host_col: str | None = None,
) -> DataFrame:
    """Per-registered-domain corpus statistics: pages, distinct hosts,
    total/mean text chars — the relation domain-balance decisions read.
    One shuffle on domain.  ``host_col`` reuses a precomputed host
    column (with_url_parts) instead of re-parsing the URL."""
    d = with_domain(df, url_col, host_col=host_col)
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct(host_col or "host").alias("n_hosts"),
    ]
    if text_col is not None:
        aggs += [
            F.sum(F.length(text_col)).cast("long").alias("total_chars"),
            F.avg(F.length(text_col)).alias("mean_chars"),
        ]
    return d.groupBy("domain").agg(*aggs)


def cap_per_domain(
    df: DataFrame,
    cap: int,
    url_col: str = "target_uri",
    priority: Column | None = None,
    host_col: str | None = None,
) -> DataFrame:
    """Keep at most ``cap`` pages per registered domain — the C4-style
    anti-monoculture gate.  Selection is DETERMINISTIC: rows rank by
    ``priority`` ascending (default xxhash64 of the URL — an unbiased,
    reproducible lottery; pass e.g. a quality score's negation to keep
    best-first) with the URL as tiebreak, via one window over the
    domain — no global sort, no driver state.  Output = the input rows
    that survive, with their rank.

    Rows whose URL yields NO domain (unparseable/hostless) pass through
    with rank 1 rather than competing in one shared bucket: a real
    crawl holds millions of garbage URLs, and a common null window key
    would be a corpus-growing skew partition (the same hazard the
    paragraph-dedup blank keys avoid).  Filter ``domain IS NULL``
    before or after if those rows should drop instead.

    ``host_col`` reuses a precomputed host column (with_url_parts)
    instead of re-parsing the URL; the caller's column passes through
    untouched."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from pyspark.sql import Window

    # the fallback key must be ROW-unique, not URL-unique: repeated
    # copies of the same unparseable URL would otherwise share a window
    # key and compete under the cap, contradicting the pass-through
    # contract above
    d = with_domain(df, url_col, host_col=host_col).withColumn(
        "_row_uid", F.monotonically_increasing_id()
    )
    pr = priority if priority is not None else F.xxhash64(F.col(url_col))
    key = F.coalesce(
        F.col("domain"),
        F.concat_ws(
            "-", F.lit("nodomain"), F.col("_row_uid").cast("string")
        ),
    )
    w = Window.partitionBy(key).orderBy(pr.asc(), F.col(url_col).asc())
    out = (
        d.withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .where(F.col("domain_rank") <= cap)
        .drop("_row_uid")
    )
    # the derived host column is internal; a caller-supplied one is not
    return out.drop("host") if host_col is None else out
