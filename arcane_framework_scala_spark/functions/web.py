"""Web-corpus curation: URL canonicalization, host statistics, per-host
caps, canonical-URL dedup.

Beyond-reference surface (the reference at /root/reference is a CDC
framework with no web-curation operators); modeled on the published
CCNet / RefinedWeb / FineWeb curation recipes — URL normalization, then
host-level balancing so a handful of mega-hosts cannot dominate the
training mix.

Scale posture (100 TB): every operator here is a narrow projection
(canonicalization — regexp/array expressions, whole-stage codegen) or a
single hash shuffle on ``host`` / ``canon_url``. Host keys are Zipfian in
real crawls; the cap/dedup operators use window functions over the hash
shuffle, so one hot host lands in one task — callers with a known
mega-host should pre-filter it or raise ``spark.sql.shuffle.partitions``;
AQE skew-join handling does not apply to windows, which is why
``host_cap_sample`` bounds the damage by construction: only the first
``cap`` row_numbers per host survive, and the sort within one host
partition is O(|host| log |host|) on md5 strings.

Determinism: cross-engine ordering/tie-breaks use md5 (the only hash both
Spark and DuckDB share), never engine RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

# Tracking parameters stripped by canonicalization: the de-facto public
# list (Google/Facebook/Microsoft/Mailchimp/Instagram click ids + the
# whole utm_* family, including GA4's underscore names like
# utm_source_platform). Case-insensitive: UTM_SOURCE tracks the same.
TRACKING_PARAM_RE = r"(?i)^(utm_[a-z_]+|fbclid|gclid|msclkid|mc_eid|igshid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored so the '?' must occur BEFORE any '#': a URL with no query but
# a '?' inside its fragment (http://h/p#a?b) has NO query — the unanchored
# r'\?([^#]*)' misparsed fragment text as a query and split genuinely
# identical canonical URLs. [^#?]* stops at the FIRST of '?'/'#', so a
# query containing further '?' chars (legal) is still captured whole.
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def url_canonicalize(
    df: DataFrame,
    url_col: str = "url",
    tracking_re: str = TRACKING_PARAM_RE,
) -> DataFrame:
    """Append ``(scheme, host, domain, canon_url)`` parsed from ``url_col``.

    Canonical form: lowercase scheme and host, userinfo dropped, IPv6
    bracket literals kept intact, leading ``www.`` stripped,
    scheme-default ports (http:80 / https:443) dropped, trailing path
    slashes trimmed, fragment removed, tracking query params removed and
    the survivors sorted bytewise. ``domain`` is the last two host labels
    (a public-suffix list is out of scope; callers with one can override).

    URLs the parser cannot anchor (no ``scheme://`` or empty host —
    protocol-relative or bare paths) get NULL ``scheme``/``host``/
    ``domain``/``canon_url`` instead of silently colliding on a
    degenerate key; route or repair them before dedup/caps (NULL canon
    rows are never merged by :func:`url_dedup`).

    Pure narrow column expressions — no shuffle, codegen-friendly, safe to
    run inline in a 100 TB scan.
    """
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    # authority = [userinfo@]host[:port]; host may be a bracketed IPv6
    # literal (which can itself contain ':')
    hostauth = F.regexp_replace(auth, r"^[^@/]*@", "")
    host = F.when(
        hostauth.startswith("["),
        F.lower(F.regexp_extract(hostauth, r"^(\[[^\]]*\])", 1)),
    ).otherwise(
        F.regexp_replace(
            F.lower(F.regexp_extract(hostauth, r"^([^:]*)", 1)),
            r"^www\.",
            "",
        )
    )
    port_raw = F.regexp_extract(hostauth, r":([0-9]+)$", 1)
    port = F.when(
        ((scheme == "https") & (port_raw == "443"))
        | ((scheme == "http") & (port_raw == "80")),
        F.lit(""),
    ).otherwise(port_raw)
    path = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), r"/+$", "")
    query_raw = F.regexp_extract(url, _QUERY_RE, 1)
    kept_q = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query_raw, "&"),
                lambda p: (p != "") & ~p.rlike(tracking_re),
            )
        ),
        "&",
    )
    parsed = (scheme != "") & (host != "")
    canon = F.when(
        parsed,
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(port == "", F.lit("")).otherwise(
                F.concat(F.lit(":"), port)
            ),
            path,
            F.when(kept_q == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), kept_q)
            ),
        ),
    )
    domain = F.coalesce(
        F.nullif(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1), F.lit("")),
        host,
    )
    return df.withColumns(
        {
            "scheme": F.when(parsed, scheme),
            "host": F.when(parsed, host),
            "domain": F.when(parsed, domain),
            "canon_url": canon,
        }
    )


def url_canonicalize_sql(
    inner: str,
    url_col: str = "url",
    tracking_re: str = TRACKING_PARAM_RE,
) -> str:
    """DuckDB twin of :func:`url_canonicalize` over the ``inner`` query
    (which must expose ``url_col``); emits the same four extra columns."""
    return f"""
WITH u0 AS ({inner}),
u1 AS (
  -- DuckDB regexp_extract yields NULL on no match where Spark yields '';
  -- coalesce every extract so the algebra below matches bytewise.
  SELECT *,
    coalesce(lower(regexp_extract({url_col}, '{_SCHEME_RE}', 1)), '') AS __scheme,
    coalesce(regexp_extract({url_col}, '{_AUTH_RE}', 1), '') AS __auth,
    coalesce(regexp_extract({url_col}, '{_PATH_RE}', 1), '') AS __pathraw,
    coalesce(regexp_extract({url_col}, '^[^#?]*\\?([^#]*)', 1), '') AS __queryraw
  FROM u0
),
u1b AS (
  -- authority = [userinfo@]host[:port]; IPv6 bracket literals intact
  SELECT *, regexp_replace(__auth, '^[^@/]*@', '') AS __hostauth FROM u1
),
u2 AS (
  SELECT *,
    CASE WHEN __hostauth LIKE '[%'
         THEN coalesce(lower(regexp_extract(__hostauth, '^(\\[[^\\]]*\\])', 1)), '')
         ELSE regexp_replace(lower(coalesce(regexp_extract(__hostauth, '^([^:]*)', 1), '')), '^www\\.', '')
    END AS __host,
    coalesce(regexp_extract(__hostauth, ':([0-9]+)$', 1), '') AS __portraw,
    regexp_replace(__pathraw, '/+$', '') AS __path,
    -- coalesce: DuckDB array_to_string([]) is NULL, Spark array_join is ''
    coalesce(array_to_string(
      list_sort(
        list_filter(string_split(__queryraw, '&'),
                    p -> p <> '' AND NOT regexp_matches(p, '{tracking_re}'))),
      '&'), '') AS __keptq
  FROM u1b
),
u3 AS (
  SELECT *,
    CASE WHEN (__scheme = 'https' AND __portraw = '443')
           OR (__scheme = 'http' AND __portraw = '80')
         THEN '' ELSE __portraw END AS __port,
    (__scheme <> '' AND __host <> '') AS __parsed
  FROM u2
)
SELECT * EXCLUDE (__scheme, __auth, __hostauth, __pathraw, __queryraw,
                  __portraw, __path, __keptq, __port, __host, __parsed),
  CASE WHEN __parsed THEN __scheme END AS scheme,
  CASE WHEN __parsed THEN __host END AS host,
  CASE WHEN __parsed THEN
    coalesce(nullif(regexp_extract(__host, '([^.]+\\.[^.]+)$', 1), ''), __host)
  END AS domain,
  CASE WHEN __parsed THEN
    __scheme || '://' || __host
      || CASE WHEN __port = '' THEN '' ELSE ':' || __port END
      || __path
      || CASE WHEN __keptq = '' THEN '' ELSE '?' || __keptq END
  END AS canon_url
FROM u3
""".strip()


def host_stats(
    df: DataFrame,
    host_col: str = "host",
    url_col: str = "canon_url",
    size_col: str | None = None,
) -> DataFrame:
    """Per-host corpus profile: ``(host, docs, distinct_urls[, sum_size])``.

    One hash shuffle on ``host``; partial aggregation is map-side, so a
    Zipfian host distribution reduces before it shuffles.
    """
    aggs = [
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct(F.col(url_col)).alias("distinct_urls"),
    ]
    if size_col is not None:
        aggs.append(F.sum(F.col(size_col)).alias("sum_size"))
    return df.groupBy(F.col(host_col).alias("host")).agg(*aggs)


def host_stats_sql(
    inner: str,
    host_col: str = "host",
    url_col: str = "canon_url",
    size_col: str | None = None,
) -> str:
    size = (
        f", CAST(sum({size_col}) AS BIGINT) AS sum_size"
        if size_col is not None
        else ""
    )
    return f"""
SELECT {host_col} AS host, count(*) AS docs,
       count(DISTINCT {url_col}) AS distinct_urls{size}
FROM ({inner}) GROUP BY 1
""".strip()


def host_cap_sample(
    df: DataFrame,
    cap: int,
    host_col: str = "host",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per host (RefinedWeb-style host
    balancing), chosen deterministically by md5 of the id — an unbiased,
    engine-independent sample. Adds ``host_rank`` (1-based)."""
    rk = F.row_number().over(
        Window.partitionBy(host_col).orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
    )
    return (
        df.withColumn("host_rank", rk)
        .filter(F.col("host_rank") <= cap)
    )


def host_cap_sample_sql(
    inner: str, cap: int, host_col: str = "host", id_col: str = "doc_id"
) -> str:
    return f"""
SELECT * FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY {host_col}
      ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS INT) AS host_rank
  FROM ({inner})
) WHERE host_rank <= {cap}
""".strip()


def url_dedup(
    df: DataFrame,
    url_col: str = "canon_url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """One row per canonical URL: highest ``quality_col`` wins (ties and
    the no-quality case fall back to lowest id — deterministic). Rows
    with a NULL canonical URL (unparseable input) are never merged with
    each other — each keeps its own row (partition key falls back to a
    per-id sentinel that cannot collide with a real URL, which always
    starts with ``scheme://``)."""
    order = (
        [F.col(quality_col).desc(), F.col(id_col).asc()]
        if quality_col is not None
        else [F.col(id_col).asc()]
    )
    part = F.coalesce(
        F.col(url_col),
        F.concat(F.lit("unparsed ¶ "), F.col(id_col).cast("string")),
    )
    rk = F.row_number().over(Window.partitionBy(part).orderBy(*order))
    return df.withColumn("__rk", rk).filter(F.col("__rk") == 1).drop("__rk")


def url_dedup_sql(
    inner: str,
    url_col: str = "canon_url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> str:
    order = (
        f"{quality_col} DESC, {id_col} ASC"
        if quality_col is not None
        else f"{id_col} ASC"
    )
    part = (
        f"coalesce({url_col}, 'unparsed ¶ ' || CAST({id_col} AS VARCHAR))"
    )
    return f"""
SELECT * EXCLUDE (__rk) FROM (
  SELECT *, row_number() OVER (PARTITION BY {part} ORDER BY {order}) AS __rk
  FROM ({inner})
) WHERE __rk = 1
""".strip()


# ---------------------------------------------------------------------------
# Synthetic URL derivation for the driver gates: the test tables carry no
# URL column, so the gate derives a deterministic messy URL from
# (source, doc_id) — same arithmetic on both engines; what the gate tests
# is the canonicalization algebra above, on inputs that exercise every
# branch (case noise, www, default and explicit ports, trailing slashes,
# tracking params in scrambled order, fragments, missing query).
# ---------------------------------------------------------------------------


def synthetic_url_column(id_col: str = "doc_id", src_col: str = "source") -> Column:
    i = F.col(id_col)
    src = F.col(src_col)
    scheme = F.when(i % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    hostpart = (
        F.when(i % 3 == 0, F.concat(F.lit("WWW."), src, F.lit(".Example.COM")))
        .when(i % 3 == 1, F.concat(src, F.lit(".example.com")))
        .otherwise(F.concat(F.lit("API."), F.upper(src), F.lit(".example.org")))
    )
    port = (
        F.when(i % 4 == 0, F.lit(":443"))
        .when(i % 4 == 1, F.lit(":80"))
        .when(i % 4 == 2, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/p/"),
        (i % 7).cast("string"),
        F.when(i % 5 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = (
        F.when(
            i % 3 == 0,
            F.concat(F.lit("?utm_source=x&id="), i.cast("string"), F.lit("&b=2")),
        )
        .when(
            i % 3 == 1,
            F.concat(F.lit("?id="), i.cast("string"), F.lit("&utm_campaign=y&a=1&fbclid=zz")),
        )
        .otherwise(F.lit(""))
    )
    frag = F.when(i % 6 == 0, F.lit("#frag")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), hostpart, port, path, query, frag)


def synthetic_url_sql(id_col: str = "doc_id", src_col: str = "source") -> str:
    """DuckDB expression computing byte-identical URLs."""
    i, s = id_col, src_col
    return f"""(
  CASE WHEN {i} % 2 = 0 THEN 'HTTPS' ELSE 'http' END || '://'
  || CASE WHEN {i} % 3 = 0 THEN 'WWW.' || {s} || '.Example.COM'
          WHEN {i} % 3 = 1 THEN {s} || '.example.com'
          ELSE 'API.' || upper({s}) || '.example.org' END
  || CASE WHEN {i} % 4 = 0 THEN ':443' WHEN {i} % 4 = 1 THEN ':80'
          WHEN {i} % 4 = 2 THEN ':8080' ELSE '' END
  || '/p/' || CAST({i} % 7 AS VARCHAR)
  || CASE WHEN {i} % 5 = 0 THEN '/' ELSE '' END
  || CASE WHEN {i} % 3 = 0 THEN '?utm_source=x&id=' || CAST({i} AS VARCHAR) || '&b=2'
          WHEN {i} % 3 = 1 THEN '?id=' || CAST({i} AS VARCHAR) || '&utm_campaign=y&a=1&fbclid=zz'
          ELSE '' END
  || CASE WHEN {i} % 6 = 0 THEN '#frag' ELSE '' END
)""".strip()


def blocklist_filter(
    df: DataFrame,
    blocked_domains: list[str] | DataFrame,
    host_col: str = "host",
    domain_col: str = "domain",
    path_col: str | None = None,
    disallow_prefixes: list[str] | None = None,
) -> DataFrame:
    """Drop documents whose domain is blocklisted or whose path falls
    under a disallowed prefix (the robots/licensing filter every crawl
    pipeline runs before anything else).

    ``blocked_domains`` blocks the registered domain AND every subdomain
    host under it. Small lists become a broadcast anti-join (blocklists
    are thousands of rows, never corpus-sized); a DataFrame input
    (column ``domain``) supports externally-managed lists. Rows with a
    NULL host/domain (unparseable URLs) are NOT dropped here — route
    them explicitly; a blocklist that silently eats unparseable rows
    hides data-quality signal.

    ``disallow_prefixes`` applies robots-style path-prefix rules
    globally (e.g. ``['/api/', '/login']``) as a narrow in-scan filter.
    """
    spark = df.sparkSession
    if isinstance(blocked_domains, DataFrame):
        bl = blocked_domains.select(F.col("domain").alias("__bl_domain"))
    else:
        bl = spark.createDataFrame(
            [(d.lower(),) for d in blocked_domains], "__bl_domain string"
        )
    cond = (F.col(domain_col) == F.col("__bl_domain")) | (
        F.col(host_col) == F.col("__bl_domain")
    ) | F.col(host_col).endswith(
        F.concat(F.lit("."), F.col("__bl_domain"))
    )
    out = df.join(F.broadcast(bl), cond, "left_anti")
    if path_col is not None and disallow_prefixes:
        keep = F.lit(True)
        for p in disallow_prefixes:
            keep = keep & ~F.coalesce(
                F.col(path_col).startswith(p), F.lit(False)
            )
        out = out.filter(keep)
    return out


# --- HTML -> text extraction (r8) -------------------------------------
#
# The crawl stage before every text operator: strip markup, keep the
# prose. Deliberately the REGEX class of extractor (jusText/trafilatura
# are DOM-based and need native libs); the pattern set is chosen to be
# portable across Java regex (Spark) and RE2 (DuckDB) — no backrefs, no
# lookaround — so the oracle twin is byte-exact. Runs as a chain of
# narrow regexp_replace projections: whole-stage codegen, zero shuffles,
# inlineable into a 100 TB scan.

#: (pattern, replacement) chain; order matters. \n replacements use a
#: placeholder resolved per engine (Python "\n" / SQL chr(10)).
_HTML_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", ""),     # active content out first
    (r"(?is)<style[^>]*>.*?</style>", ""),
    (r"(?s)<!--.*?-->", ""),                      # comments
    # block-level closers + <br> become line breaks BEFORE tag strip
    (r"(?is)</(?:p|div|li|tr|h1|h2|h3|h4|h5|h6|blockquote)>|<br[^>]*>",
     "\n"),
    (r"(?s)<[^>]+>", " "),                        # every remaining tag
    # minimal entity set (full tables are library territory)
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),                              # LAST: && double-escapes
    # whitespace normalization: spaces/tabs collapse, newlines tighten,
    # ends trimmed (regex, not SQL trim — trim() won't take newlines).
    # CRLF folds to \n FIRST — crawl HTML is overwhelmingly \r\n, and
    # the later steps only treat \n as a line break (ADVICE r8: stray
    # mid-document \r survived otherwise). RE2-safe: no backrefs.
    (r"\r\n?", "\n"),
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    # explicit class, NOT \s: Java's \s includes \x0B, RE2's does not —
    # the twin contract needs the same character set in both engines
    (r"^[ \t\r\n\f]+", ""),
    (r"[ \t\r\n\f]+$", ""),
]


def html_extract(col: Column) -> Column:
    """Markup-stripped text of an HTML column: scripts/styles/comments
    removed, block boundaries become newlines, tags dropped, the basic
    entity set decoded, whitespace normalized, result trimmed."""
    out = col
    for pat, repl in _HTML_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return out


def html_extract_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_extract` — the same pattern chain
    (RE2-safe by construction) with the global flag per step."""
    out = expr
    for pat, repl in _HTML_STEPS:
        p = pat.replace("'", "''")
        if repl == "\n":
            r = "chr(10)"
        else:
            r = "'" + repl.replace("'", "''") + "'"
        out = f"regexp_replace({out}, '{p}', {r}, 'g')"
    return out
