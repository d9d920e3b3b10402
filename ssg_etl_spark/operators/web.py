"""URL/domain-level curation: host extraction, per-domain stats, domain
blocklists, and per-domain document caps — the C4/RefinedWeb-style web-
corpus steps that bound any single site's weight in a training mix
(BASELINE.json north-star extension; no reference counterpart).

Scale design: host/domain extraction is a pure per-row projection (no
UDF); blocklists are list-sized → broadcast anti-join; the per-domain cap
rides :func:`ssg_etl_spark.operators.sampling.stratified_sample`, whose
rank-limit window pushes the k-per-stratum limit map-side
(WindowGroupLimit), so a mega-domain sheds rows before the stratum
shuffle instead of funneling through one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ssg_etl_spark.operators.sampling import stratified_sample

# Generic registrable-domain heuristic: the last two host labels. Real
# deployments substitute the public-suffix list (e.g. "co.uk" needs three
# labels); the operator contract (group by registrable domain) and the
# plan shape are unchanged by the lookup's sophistication.
_DOMAIN_RE = r"([^.]+\.[^.]+)$"


def with_url_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``host`` (parse_url HOST — scheme/port/path-safe) and
    ``domain`` (registrable-domain heuristic) columns. Pure Column
    expressions; NULL/relative URLs AND single-label hosts (``localhost``,
    an intranet name — nothing the two-label heuristic can call a
    registrable domain) yield NULL domain, never the empty string
    ``regexp_extract`` returns on no match: an ``''`` domain would silently
    merge every such host into one phantom "site" for caps, splits, and
    reputation."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    dom = F.regexp_extract(F.col("host"), _DOMAIN_RE, 1)
    return df.withColumn("host", host).withColumn(
        "domain",
        F.when(
            F.col("host").isNotNull()
            & (F.col("host") != "")
            & (dom != ""),
            dom,
        ),
    )


def domain_stats(df: DataFrame, chars_col: str = "n_chars") -> DataFrame:
    """Per-domain corpus profile: document count, distinct hosts, and
    total characters — the triage view behind cap/blocklist decisions.
    One map-side-combinable aggregation on the domain key."""
    return df.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.sum(F.col(chars_col).cast("long")).alias("total_chars"),
    )


def domain_blocklist_filter(df: DataFrame, blocked: DataFrame) -> DataFrame:
    """Drop documents whose ``domain`` appears in ``blocked`` (a one-column
    ``domain`` frame — list-sized by contract, so the anti-join
    broadcasts; the corpus is never shuffled)."""
    return df.join(
        F.broadcast(blocked.select("domain").distinct()), "domain", "left_anti"
    )


def domain_cap(
    df: DataFrame, max_per_domain: int, id_col: str = "doc_id"
) -> DataFrame:
    """Keep at most ``max_per_domain`` documents per registrable domain,
    selected by id-hash rank (a deterministic, repartition-stable
    "random" subset — the C4-style guard against any one site dominating
    the mix). Returns (domain, id, cap_rank) for the kept rows; semi-join
    back on ``id_col`` for the surviving corpus.

    The rank window inherits stratified_sample's WindowGroupLimit
    pushdown: each input partition forwards at most ``max_per_domain``
    rows per domain, so a 10⁶-document template domain sheds its excess
    map-side rather than sorting in one reducer partition.
    """
    kept = stratified_sample(df, ["domain"], max_per_domain, id_col=id_col)
    return kept.select(
        "domain", id_col, F.col("sample_rank").alias("cap_rank")
    )


def domain_quality_flags(
    df: DataFrame,
    score_col: str = "quality_score",
    min_mean_quality: float = 0.5,
) -> DataFrame:
    """Domain-level reputation (the RefinedWeb/DCLM-style site filter):
    aggregate each registrable domain's mean document quality and flag
    documents whose DOMAIN falls below ``min_mean_quality`` — low-quality
    sites are dropped wholesale even when an individual page sneaks past
    the per-document threshold. Returns the input's (doc_id, domain) plus
    (domain_n_docs, domain_mean_quality, low_quality_domain).

    One domain-keyed aggregation + a join back. The aggregate side is one
    row per registrable domain — dimension-sized next to the corpus — so
    AQE broadcasts the join-back in practice; the corpus itself shuffles
    only if the optimizer decides the domain dim is too big to broadcast.
    The mean runs on DECIMAL(18,12) partial sums (scores are 6-decimal
    rounded, exactly representable) so the double-addition order never
    flips a rounding boundary vs the oracle.

    NULL-domain documents (relative URLs, single-label hosts) PASS
    THROUGH with NULL reputation columns — the join-back is a LEFT join,
    so unattributable pages are neither silently dropped nor lumped into
    one phantom reputation group; "keep where NOT low_quality_domain" on
    the output retains them (NULL is not true), which is the safe
    default for a site-level filter.
    """
    per_domain = df.filter(F.col("domain").isNotNull()).groupBy("domain").agg(
        F.count(F.lit(1)).alias("domain_n_docs"),
        F.sum(F.col(score_col).cast("decimal(18,12)")).alias("_sum_q"),
    )
    # Cast the (exact) decimal sum to double BEFORE dividing: both engines
    # then perform the identical double division, instead of each picking
    # its own decimal-division scale.
    mean_q = F.round(
        F.col("_sum_q").cast("double")
        / F.col("domain_n_docs").cast("double"),
        6,
    )
    dim = per_domain.select(
        "domain",
        "domain_n_docs",
        mean_q.alias("domain_mean_quality"),
        (mean_q < min_mean_quality).alias("low_quality_domain"),
    )
    return df.select("doc_id", "domain").join(dim, "domain", "left")


def normalize_url(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Canonicalize URLs before URL-level dedup/caps — the standard web-
    corpus step that collapses the dozen spellings of one page: lowercase
    scheme+host, strip the fragment, drop default ports (http:80,
    https:443), strip trailing slashes, drop tracking parameters
    (utm_*, gclid, fbclid), and sort the surviving query params so
    parameter order is not identity. Pure Column expressions (regex +
    array lambdas), engine-portable for the oracle; a value with no
    absolute scheme://host yields NULL (relative or junk input — not
    silently passed through as if canonical).
    """
    u = F.regexp_replace(F.col(url_col), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1)
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    hostname = F.regexp_replace(hostport, r":[0-9]+$", "")
    drop_port = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_replace(
        F.regexp_extract(
            u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)", 1
        ),
        "/+$",
        "",
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "")
                & ~p.rlike("^(utm_[^=]*|gclid|fbclid)="),
            )
        ),
        "&",
    )
    norm = F.concat(
        scheme,
        F.lit("://"),
        hostname,
        F.when(~drop_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    return df.withColumn(
        out_col, F.when((scheme != "") & (hostname != ""), norm)
    )
