"""URL normalization and domain-level corpus shaping for web pages.

The ops every Common-Crawl-style pipeline runs between fetch and
training: canonicalize URLs (so exact-URL dedup keys agree), extract
host / registrable-domain columns, and cap or rebalance the corpus per
domain (a handful of hosts dominate raw crawls; training mixes bound
each domain's share).  The reference engine has no web-text surface;
this extends the LLM-data-pipeline operator tier mandated alongside
SURVEY §2 (same family as textops.*).

Everything is pure JVM expressions (``parse_url``, regexps, one window
per cap) — no Python in any per-row path, so the ops scale with the
scan.

Registrable-domain note: exact eTLD+1 needs the Mozilla public-suffix
list, which is not bundled offline.  ``registrable_domain`` implements
the standard last-two-labels heuristic with a small built-in set of
two-level public suffixes (co.uk, com.au, ...) — documented
approximation, exact for generic TLDs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# common two-level public suffixes (the heuristic's exception set);
# extend freely — membership only widens what counts as a suffix
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.za", "com.tr", "com.ar", "com.sg",
)


def canonicalize_url(url: Column) -> Column:
    """Canonical form for exact-URL keys: lowercase the scheme and the
    whole authority (including any userinfo — credentials are treated
    case-insensitively by this key, a deliberate collapse), strip the
    fragment, drop default ports (:80 http / :443 https), remove ANY
    trailing slash that follows a non-slash character (https://h/a/ and
    https://h/a share one key — near-dup keying semantics, not RFC 3986
    equivalence), keep query as-is (order-preserving — reordering params
    changes semantics on some sites)."""
    u = F.trim(url)
    # lowercase scheme://host[:port] prefix only (path/query stay exact)
    head = F.regexp_extract(u, r"^([^:/?#]+://[^/?#]*)", 1)
    tail = F.substring(u, F.length(head) + F.lit(1), F.lit(1 << 30))
    u = F.concat(F.lower(head), tail)
    u = F.regexp_replace(u, r"#.*$", "")                  # fragment
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80(?=[/?#]|$)", r"$1")
    # bare trailing slash: https://h/ -> https://h ; path/ -> path
    u = F.regexp_replace(u, r"(?<=[^/])/$", "")
    return u


def url_host(url: Column) -> Column:
    """Lowercased host (no port, no credentials); empty string when the
    URL has no authority component."""
    # try_parse_url: ANSI mode makes parse_url THROW on malformed urls
    h = F.lower(F.coalesce(F.try_parse_url(F.trim(url), F.lit("HOST")),
                           F.lit("")))
    return F.regexp_replace(h, r"^www\.", "")


def registrable_domain(url: Column) -> Column:
    """Last-two-labels registrable domain with a two-level-suffix
    exception set (see module doc): ``a.b.co.uk -> b.co.uk``,
    ``a.b.example.com -> example.com``, bare/one-label hosts pass
    through."""
    h = url_host(url)
    last2 = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(h, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    is_two_level = last2.isin(*TWO_LEVEL_SUFFIXES)
    return F.when(h == "", F.lit("")) \
            .otherwise(F.when(is_two_level & (last3 != ""), last3)
                        .otherwise(F.when(last2 != "", last2).otherwise(h)))


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append canon_url / host / domain columns."""
    u = F.col(url_col)
    return (df.withColumn("canon_url", canonicalize_url(u))
              .withColumn("host", url_host(u))
              .withColumn("domain", registrable_domain(u)))


def domain_cap(df: DataFrame, max_per_domain: int,
               url_col: str = "url",
               order_by: Column | None = None) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per registrable domain —
    the crawl-rebalancing cap.  ``order_by`` ranks which rows survive
    (default: canonical URL ascending, a deterministic tiebreak); ties
    beyond the cap are dropped deterministically.

    One window per domain (hash-partitioned shuffle on the domain key);
    heavy domains are single partitions — for a corpus where one domain
    exceeds executor memory, pre-filter with ``domain_counts`` and
    sample instead (cap >> partition budget is a data bug, not a plan
    shape).
    """
    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    d = registrable_domain(F.col(url_col))
    ob = order_by if order_by is not None \
        else canonicalize_url(F.col(url_col))
    w = Window.partitionBy(d).orderBy(ob)
    return (df.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= max_per_domain)
              .drop("_rn"))


def domain_counts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(domain, n_pages) — map-side-combinable groupBy."""
    return (df.groupBy(registrable_domain(F.col(url_col)).alias("domain"))
              .agg(F.count(F.lit(1)).alias("n_pages")))


def domain_mixture_weights(df: DataFrame, alpha: float = 0.5,
                           url_col: str = "url") -> DataFrame:
    """Per-domain resampling keep-rates that flatten the domain
    distribution toward ``count**alpha`` (alpha=1 keeps the natural
    mix, alpha=0 makes every domain equal weight).  Returns
    (domain, n_pages, keep_rate in (0,1]) — feed keep_rate into
    textops.mixture's deterministic Bernoulli to materialize.

    Rates are normalized so the SMALLEST domain's rate is 1.0 — the
    per-row rate n**(alpha-1) is decreasing in n, so every other domain
    lands strictly below 1 (pure down-sampling; no upsampling
    surprises)."""
    if not (0.0 <= alpha <= 1.0):
        raise ValueError("alpha must be in [0, 1]")
    c = domain_counts(df, url_col)
    # target share ∝ n**alpha → per-row keep rate ∝ n**(alpha-1)
    rate = F.pow(F.col("n_pages").cast("double"), F.lit(alpha - 1.0))
    mx = c.agg(F.min(F.col("n_pages")).alias("m")).select(
        F.pow(F.col("m").cast("double"), F.lit(alpha - 1.0)).alias("r0"))
    return (c.crossJoin(F.broadcast(mx))
             .withColumn("keep_rate", rate / F.col("r0"))
             .drop("r0"))