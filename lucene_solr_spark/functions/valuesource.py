"""Solr function-query (ValueSource) surface: a parser for the function
syntax plus Column builders for the function vocabulary.

Ref: solr/core/src/java/org/apache/solr/search/ValueSourceParser.java
(the ~74 registered parsers) and lucene/queries/.../function/valuesource/
(ReciprocalFloatFunction.java: a/(m·x+b), LinearFloatFunction.java,
ScaleFloatFunction.java, DualFloatFunction.java, ...).  Everything maps
to JVM column expressions — whole-stage codegen, no UDFs; ``scale``
needs the field's global min/max, supplied via a one-row cross join
(the reference computes the same pair in ScaleFloatFunction.createWeight).

Supported names (arity): const literals, field refs, abs, ceil, floor,
sqrt, ln, log, exp, pow(2), sum(n), sub(2), product(n), div(2), mod(2),
min(n), max(n), recip(4), linear(3), map(4), scale(3: uses min/max over
df), if(3), exists(1), not(1), sqedist(2n), dist(1+2n p-norm),
geodist(4: haversine km), strdist(2-3: edit-distance similarity),
ms(2: millis between timestamp cols), termfreq/docfreq/idf live in the
searcher layer (they need index state).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0087714  # GeoDistanceFunction / GeoUtils mean radius


def geodist_km(lat1, lon1, lat2, lon2) -> Column:
    """Haversine great-circle distance in km (solr GeoDistValueSourceParser
    → SpatialUtils; the classic haversine form)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2) - F.radians(lat1)
    dlon = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def strdist_edit(a, b) -> Column:
    """strdist(a, b, edit): 1 − levenshtein/max(len) (solr
    StrDistValueSourceParser → LuceneLevenshteinDistance-style
    normalization)."""
    ml = F.greatest(F.length(a), F.length(b))
    return F.when(ml == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / ml.cast("double")
    )


class _Parser:
    _TOK = re.compile(r'\s*([A-Za-z_][\w.]*|-?\d+\.?\d*(?:[eE]-?\d+)?|"[^"]*"|[(),])')

    def __init__(self, text: str, df: DataFrame | None):
        self.toks: list[str] = []
        i = 0
        while i < len(text):
            m = self._TOK.match(text, i)
            if not m:
                raise ValueError(f"bad function query at {text[i:]!r}")
            self.toks.append(m.group(1))
            i = m.end()
        self.pos = 0
        self.df = df

    def peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of function query")
        self.pos += 1
        return t

    def expr(self) -> Column:
        t = self.next()
        if re.fullmatch(r"-?\d+\.?\d*(?:[eE]-?\d+)?", t):
            return F.lit(float(t))
        if t.startswith('"'):
            return F.lit(t[1:-1])
        if self.peek() == "(":
            self.next()
            args: list[Column] = []
            if self.peek() != ")":
                while True:
                    args.append(self.expr())
                    if self.peek() == ",":
                        self.next()
                        continue
                    break
            if self.next() != ")":
                raise ValueError(f"expected ) in {t}(...)")
            return self._call(t, args)
        return F.col(t)  # bare field reference

    def _minmax(self, field_expr: Column) -> tuple[Column, Column]:
        if self.df is None:
            raise ValueError("scale() needs the DataFrame context")
        agg = self.df.agg(
            F.min(field_expr).alias("mn"), F.max(field_expr).alias("mx")
        ).collect()[0]
        return F.lit(float(agg["mn"])), F.lit(float(agg["mx"]))

    def _call(self, name: str, a: list[Column]) -> Column:
        n = name.lower()
        if n == "abs":
            return F.abs(a[0])
        if n == "ceil":
            return F.ceil(a[0]).cast("double")
        if n == "floor":
            return F.floor(a[0]).cast("double")
        if n == "sqrt":
            return F.sqrt(a[0])
        if n == "ln":
            return F.log(a[0])
        if n == "log":
            return F.log10(a[0])
        if n == "exp":
            return F.exp(a[0])
        if n == "pow":
            return F.pow(a[0], a[1])
        if n == "sum":
            out = a[0]
            for x in a[1:]:
                out = out + x
            return out
        if n == "sub":
            return a[0] - a[1]
        if n == "product":
            out = a[0]
            for x in a[1:]:
                out = out * x
            return out
        if n == "div":
            return a[0] / a[1]
        if n == "mod":
            return a[0] % a[1]
        if n == "min":
            return F.least(*a)
        if n == "max":
            return F.greatest(*a)
        if n == "recip":
            # ReciprocalFloatFunction: a/(m·x+b) — (x, m, a, b)
            x, m, aa, b = a
            return aa / (m * x + b)
        if n == "linear":
            x, m, c = a
            return m * x + c
        if n == "map":
            # map(x, min, max, target): x∈[min,max] → target else x
            x, mn, mx, tgt = a
            return F.when((x >= mn) & (x <= mx), tgt).otherwise(x)
        if n == "scale":
            x, lo, hi = a[0], a[1], a[2]
            mn, mx = self._minmax(x)
            return lo + (x - mn) * (hi - lo) / (mx - mn)
        if n == "if":
            return F.when(a[0].cast("boolean"), a[1]).otherwise(a[2])
        if n == "exists":
            return a[0].isNotNull()
        if n == "not":
            return ~a[0].cast("boolean")
        if n == "sqedist":
            half = len(a) // 2
            out = F.lit(0.0)
            for i in range(half):
                d = a[i] - a[half + i]
                out = out + d * d
            return out
        if n == "dist":
            # dist(p, x1..xn, y1..yn): p-norm distance
            p = a[0]
            rest = a[1:]
            half = len(rest) // 2
            out = F.lit(0.0)
            for i in range(half):
                out = out + F.pow(F.abs(rest[i] - rest[half + i]), p)
            return F.pow(out, F.lit(1.0) / p)
        if n == "geodist":
            return geodist_km(a[0], a[1], a[2], a[3])
        if n == "strdist":
            return strdist_edit(a[0], a[1])
        if n == "ms":
            return (
                a[0].cast("timestamp").cast("double")
                - a[1].cast("timestamp").cast("double")
            ) * 1000.0
        raise ValueError(f"unknown function {name!r}")


def parse_function_query(text: str, df: DataFrame | None = None) -> Column:
    """Parse a Solr function-query string into a Column expression.

    ``df`` supplies the DataFrame context for functions that need global
    statistics (``scale``)."""
    p = _Parser(text, df)
    out = p.expr()
    if p.peek() is not None:
        raise ValueError(f"trailing input: {p.toks[p.pos:]}")
    return out
