"""URL classification + canonical-URL dedup for web/training corpora.

Re-expresses Solr's URLClassifyProcessor
(solr/core/src/java/org/apache/solr/update/processor/URLClassifyProcessor.java:45-240)
as pure Spark column expressions — no Python UDFs, one linear pass, no
shuffle until the (optional) canonical-group dedup agg:

  * ``url_norm``       — RFC 3986 dot-segment normalization of the path
                         (``URI.normalize()``): ``.`` segments dropped,
                         ``segment/..`` pairs removed, directory-ness
                         preserved (``/a/b/..`` → ``/a/``).  Scheme,
                         host, port, query survive verbatim (the
                         reference does NOT lowercase the host or strip
                         default ports — neither do we).
  * ``url_length``     — characters in the normalized URL (length()).
  * ``url_levels``     — '/' count of the lowercased path after the
                         landing-page suffix and trailing slashes are
                         removed (levels()).
  * ``url_toplevel``   — 1 when that stripped path is empty and there
                         is no query string (isTopLevelPage()).
  * ``url_landingpage``— 1 when there is no query and the lowercased
                         path ends with one of the reference's
                         landing-page suffixes, checked IN ORDER with
                         "/" first (isLandingPage()/landingPageSuffix()).
  * ``url_domain``     — host part (getHost()).
  * ``url_canonical``  — the normalized URL with a trailing
                         ``/<suffix>`` landing suffix replaced by "/"
                         (getCanonicalUrl()).  Faithful quirks kept: the
                         suffix regex is applied to the FULL url string
                         case-sensitively and anchored at ``$``, so a
                         URL with a query string (or an upper-case
                         suffix spelling) is returned unchanged, exactly
                         like the reference's ``replaceFirst(lps+"$")``.

Scale shape: everything is per-row column arithmetic inside whole-stage
codegen except the dot-segment fold, which is one ``F.aggregate`` over
the path's ~6 segments (vocabulary-independent, no shuffle, no UDF).
``canonical_url_dedup`` adds the single hash-groupBy every URL-level
dedup needs — the same map-side-combine shape as exact text dedup.

Fragments follow java.net.URL: the '#fragment' survives in
``url_norm`` (``URI.normalize().toURL().toString()`` keeps the ref) and
the query is the '?'..'#' span only — a '?' INSIDE the fragment
('http://h/p#a?b') is not a query, so ``url.getQuery() == null`` checks
(url_toplevel / url_landingpage) treat such URLs as query-free.

Known, documented divergences from the JVM original: consecutive
slashes ("//") and rootless ".." segments are assumed absent (the
corpus-prep synthesis never emits them; ``URI.normalize`` keeps both
verbatim), and a malformed URL yields NULL columns rather than a logged
skip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# URLClassifyProcessor.landingPageSuffixes — order matters ("/" first).
LANDING_SUFFIXES = [
    "/",
    "index.html", "index.htm", "index.phtml", "index.shtml", "index.xml",
    "index.php", "index.asp", "index.aspx",
    "welcome.html", "welcome.htm", "welcome.phtml", "welcome.shtml",
    "welcome.xml", "welcome.php", "welcome.asp", "welcome.aspx",
]


def _normalize_path(path: Column) -> Column:
    """RFC 3986 remove_dot_segments over an absolute path column.

    Fold the '/'-split segments with an array accumulator: '.' is a
    no-op, '..' pops, anything else pushes.  A trailing '', '.' or '..'
    marks a directory, so the result keeps (or gains) the trailing
    slash — URI.normalize()'s behavior for "/a/b/.." → "/a/".
    """
    segs = F.split(path, "/")
    n = F.size(segs)
    # drop the leading '' (absolute path) and a trailing '' (dir slash)
    last = F.element_at(segs, -1)
    body = F.when(last == "", F.slice(segs, 2, F.greatest(n - 2, F.lit(0)))).otherwise(
        F.slice(segs, 2, n - 1)
    )
    folded = F.aggregate(
        body,
        F.array().cast("array<string>"),
        lambda acc, seg: (
            F.when(seg == ".", acc)
            .when(seg == "..", F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))))
            .otherwise(F.concat(acc, F.array(seg)))
        ),
    )
    trailing_dir = (last == "") | (last == ".") | (last == "..")
    joined = F.concat(F.lit("/"), F.array_join(folded, "/"))
    return (
        F.when(F.size(folded) == 0, F.lit("/"))
        .when(trailing_dir, F.concat(joined, F.lit("/")))
        .otherwise(joined)
    )


def _landing_suffix(lower_path: Column) -> Column:
    """First matching landingPageSuffixes entry ('' when none), checked
    in the reference's array order — '/' wins over 'index.html'."""
    out = F.lit("")
    # build the CASE from the last suffix up so the FIRST match wins
    for s in reversed(LANDING_SUFFIXES):
        out = F.when(lower_path.endswith(s), F.lit(s)).otherwise(out)
    return out


def url_classify(
    df: DataFrame, url_col: str = "url", keep_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Append the URLClassifyProcessor output fields for ``url_col``."""
    url = F.col(url_col)
    scheme = F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    hostport = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    raw_path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    # java.net.URL semantics: the query is the part between '?' and the
    # FIRST '#'; a '?' inside the fragment is NOT a query
    # ('http://h/p#a?b' has query=null), and URL.toString() keeps the
    # '#fragment' (URI.normalize().toURL() preserves the ref).
    before_frag = F.substring_index(url, "#", 1)
    has_frag = url.contains("#")
    frag_part = F.when(
        has_frag,
        F.concat(F.lit("#"), F.regexp_extract(url, r"#(.*)$", 1)),
    ).otherwise(F.lit(""))
    has_query = before_frag.contains("?")
    query = F.regexp_extract(before_frag, r"\?(.*)$", 1)

    path_norm = _normalize_path(
        F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    )
    url_norm = F.concat(
        scheme, F.lit("://"), hostport, path_norm,
        F.when(has_query, F.concat(F.lit("?"), query)).otherwise(F.lit("")),
        frag_part,
    )

    lower_path = F.lower(path_norm)
    lps = _landing_suffix(lower_path)
    # getPathWithoutSuffix + trailing-slash strip (levels()/isTopLevelPage())
    stripped = F.regexp_replace(
        F.when(lps != "", F.expr(
            # replaceFirst(lps + "$", "") — lps chars '.' are regex metas in
            # the reference too; reproduce the same regex application
            f"regexp_replace(lower({'__lp__'}), concat(__lps__, '$'), '')"
        )).otherwise(lower_path),
        r"/+$", "",
    )
    out = (
        df.withColumn("__lp__", lower_path)
        .withColumn("__lps__", lps)
        .withColumn("url_norm", url_norm)
        .withColumn("__stripped__", stripped)
        .withColumn("url_length", F.length(F.col("url_norm")).cast("long"))
        .withColumn(
            "url_levels",
            (
                F.length(F.col("__stripped__"))
                - F.length(F.regexp_replace(F.col("__stripped__"), "/", ""))
            ).cast("long"),
        )
        .withColumn(
            "url_toplevel",
            F.when((F.length("__stripped__") == 0) & ~has_query, 1)
            .otherwise(0)
            .cast("long"),
        )
        .withColumn(
            "url_landingpage",
            F.when((F.col("__lps__") != "") & ~has_query, 1).otherwise(0).cast("long"),
        )
        .withColumn("url_domain", host)
        .withColumn(
            "url_canonical",
            # getCanonicalUrl(): replaceFirst("/" + lps + "$", "/") on the
            # full url string — no match (query present, case mismatch)
            # leaves the url unchanged, like the reference.
            F.when(
                F.col("__lps__") != "",
                F.expr(
                    "regexp_replace(url_norm, concat('/', __lps__, '$'), '/')"
                ),
            ).otherwise(F.col("url_norm")),
        )
    )
    return out.select(
        *keep_cols, url_col, "url_norm", "url_length", "url_levels",
        "url_toplevel", "url_landingpage", "url_domain", "url_canonical",
    )


def canonical_url_dedup(
    classified: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """One-survivor-per-canonical-URL dedup over ``url_classify`` output:
    hash groupBy on ``url_canonical`` (map-side partial agg — the same
    any-scale shape as exact text dedup), min-id survivor like
    SignatureUpdateProcessor's batch overwriteDupes."""
    return (
        classified.groupBy("url_canonical")
        .agg(
            F.min(id_col).cast("long").alias("rep_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
        .select("url_canonical", "rep_id", "dup_count")
    )
