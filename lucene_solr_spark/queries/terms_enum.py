"""TermsComponent — raw term enumeration over the term dictionary
(the Solr ``/terms`` handler).

Reference: solr/core/src/java/org/apache/solr/handler/component/
TermsComponent.java:110-245 — seeks the TermsEnum to the lower bound
(default = the prefix, inclusive by default; upper exclusive by
default), walks terms in index (byte) order, keeps terms whose docFreq
falls in [terms.mincount, terms.maxcount], and either stops after
``terms.limit`` terms (sort=index) or collects ALL in-range terms into
a bounded set ordered by (docFreq DESC, term ASC) (sort=count,
SimpleFacets.CountPair.compareTo at solr/core/.../request/
SimpleFacets.java:1108-1112) and returns the first ``limit``.

Spark-first restatement: the term dictionary IS the ``term_stats``
frame (term, df, ttf).  Every Solr parameter is a sargable predicate —
prefix → ``startswith`` (pushes down as StringStartsWith), bounds →
range predicates, mincount/maxcount → df range — and the two sort
modes are ``ORDER BY term LIMIT n`` / ``ORDER BY df DESC, term LIMIT
n``, both TakeOrderedAndProject: the scan never materializes the
vocabulary anywhere, so a 10^9-term dictionary enumerates in one
pruned columnar pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def terms_enumerate(
    term_stats: DataFrame,
    prefix: str | None = None,
    lower: str | None = None,
    upper: str | None = None,
    lower_incl: bool = True,
    upper_incl: bool = False,
    mincount: int = 1,
    maxcount: int | None = None,
    limit: int = 10,
    sort: str = "count",
    regexp: str | None = None,
) -> DataFrame:
    """Enumerate terms like the /terms handler.

    Returns DataFrame(term string, docfreq long).  ``lower`` defaults
    to the prefix (TermsComponent.java:167-169); ``limit < 0`` means
    unlimited (TermsComponent.java:117-120).
    """
    df = term_stats.select("term", F.col("df").cast("long").alias("docfreq"))
    if lower is None:
        lower = prefix  # seekCeil(prefixBytes) — :167-169
    if lower is not None:
        df = df.filter(
            F.col("term") >= lower if lower_incl else F.col("term") > lower
        )
    if upper is not None:
        df = df.filter(
            F.col("term") <= upper if upper_incl else F.col("term") < upper
        )
    if prefix is not None:
        # StringHelper.startsWith enumeration stop (:208-209) — as a
        # predicate it is order-independent and sargable
        df = df.filter(F.col("term").startswith(prefix))
    if regexp is not None:
        df = df.filter(F.col("term").rlike(regexp))
    df = df.filter(F.col("docfreq") >= int(mincount))
    if maxcount is not None and maxcount >= 0:
        df = df.filter(F.col("docfreq") <= int(maxcount))
    if sort == "count":
        # BoundedTreeSet<CountPair>: docFreq DESC, term ASC (:203,233)
        df = df.orderBy(F.col("docfreq").desc(), F.col("term").asc())
    else:
        # sort=index: enumeration (term) order, stop at limit (:205)
        df = df.orderBy(F.col("term").asc())
    if limit is not None and limit >= 0:
        df = df.limit(int(limit))
    return df
