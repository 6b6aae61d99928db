"""Streaming-expression language: parse + evaluate Solr stream strings.

Ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/expr/
{StreamExpressionParser,StreamFactory}.java (the expression grammar and
the function-name → stream-class registry) and the individual stream
classes under solr/solrj/.../io/stream/*.java cited per handler below.

The reference's users express pipelines as nested function strings —
``innerJoin(search(...), search(...), on="a=b")`` — sent to the
``/stream`` handler.  This module is that surface for the Spark engine:
the parser produces a small AST and the factory maps each function onto
the DataFrame algebra (the stream classes' openStream/read loop becomes
a declarative plan; Catalyst picks merge-join vs hash-join vs broadcast
instead of the reference's hand-rolled iterators, which is the whole
point of the Spark-first design).

Supported functions (→ reference class):

- ``search(table, q=…, fl=…, sort=…, rows=…)``  → CloudSolrStream /
  SearchStream (q runs through the engine's query parser + BM25
  searcher when the table is the indexed collection; ``*:*`` scans)
- ``select(stream, "a", "b as c")``              → SelectStream
- ``innerJoin/leftOuterJoin/hashJoin(l, r, on=)``→ {Inner,LeftOuter,
  Hash}JoinStream (equi-join; ``on="a=b"`` or ``on="a"``)
- ``merge(s1, s2, on="f asc")``                  → MergeStream
- ``sort(stream, by="f asc, g desc")``           → SortStream
- ``unique(stream, over="f")``                   → UniqueStream
- ``top(n=…, stream, sort=…)``                   → RankStream
- ``rollup(stream, over="a,b", sum(x), …)``      → RollupStream
- ``stats(stream, sum(x), …)``                   → StatsStream
- ``having(stream, gt(f, v))``                   → HavingStream with
  the boolean evaluators (eq/gt/lt/gteq/lteq/and/or/not)
- ``facet(table, buckets=, bucketSizeLimit=, metrics…)`` → FacetStream
- ``intersect/complement(l, r, on=)``            → Intersect/
  ComplementStream (semi/anti join)
- ``cartesianProduct(stream, field)``            → CartesianProductStream
  (explodes a multivalued field)
- ``fetch(table, stream, on=, fl=)``             → FetchStream
- ``let(a=expr, …, body)`` / ``get(a)``          → LetStream/GetStream
- ``echo("text")`` / ``tuple(k=v, …)``           → EchoStream/TupStream
- ``null(stream)``                               → NullStream (drain the
  stream, emit one ``nullCount`` tuple; the reference also emits a
  wall-clock ``timer`` — deliberately omitted so results stay
  deterministic / engine-comparable)
- ``list(s1, s2, …)`` / ``plist(…)``             → ListStream/
  ParallelListStream (concatenate streams; relationally both are a
  union — the reference's sequential-vs-parallel *open* distinction is
  scheduling, which Spark owns, so plist is the same plan)
- ``eval(stream)``                               → EvalStream (read the
  first tuple, parse its ``expr_s`` field as a stream expression,
  emit THAT stream)
- ``daemon(stream, id=, runInterval=)``          → DaemonStream (one
  batch iteration of the inner stream; recurring execution is the
  host's trigger loop — see streaming/topic.py for the incremental
  cursor the reference's daemon+topic pairing uses)
- ``reduce(stream, by=, group(sort=, n=))``      → ReducerStream +
  GroupOperation (top-n per group of the sorted input, ranked window)
- ``parallel(workers=, partitionKeys=, stream)`` → ParallelStream
  (Spark's shuffle IS the worker fan-out; maps to repartition)
- ``random(table, rows=, seed=, fl=)``           → RandomStream
  (deterministic under seed via xxhash64 ordering)
- ``timeseries(table, field=, gap=, start=, end=, metrics…)``
  → TimeSeriesStream (date_trunc calendar buckets per gap unit)
- ``nodes(edges, root=|rootStream, walk="from->to", maxHops=)``
  → GatherNodesStream (BFS unique-node expansion, streaming/graph.py)
- ``shortestPath(edges, from=, to=, edge="from->to", maxDepth=)``
  → ShortestPathStream (BFS level distance; no tuples if unreachable)

Metric names follow the reference's tuple keys exactly: ``sum(x)``,
``count(*)``, ``avg(x)``, ``min(x)``, ``max(x)`` (RollupStream emits
metric.getIdentifier()).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# parser (StreamExpressionParser.java)
# --------------------------------------------------------------------------

@dataclass
class StreamExpr:
    """``name(positional…, key=value…)`` — values are nested exprs or
    plain strings (quoted strings lose their quotes, as in the
    reference's StreamExpressionValue)."""

    name: str
    args: list = field(default_factory=list)
    named: dict = field(default_factory=dict)


class _Parser:
    def __init__(self, text: str) -> None:
        self.s = text
        self.i = 0

    def _ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def _ident(self) -> str:
        m = re.match(r"[A-Za-z_][\w.*]*", self.s[self.i:])
        if not m:
            raise ValueError(f"expected identifier at {self.s[self.i:self.i+20]!r}")
        self.i += m.end()
        return m.group(0)

    def _value(self) -> "StreamExpr | str":
        self._ws()
        c = self.s[self.i] if self.i < len(self.s) else ""
        if c in "\"'":
            j = self.s.index(c, self.i + 1)
            v = self.s[self.i + 1: j]
            self.i = j + 1
            return v
        # bare token up to , or ) — may be an identifier opening a call
        m = re.match(r"[^,()=\s]+", self.s[self.i:])
        if m and self.i + m.end() < len(self.s) and self.s[self.i + m.end()] == "(":
            node = self.expr()
            # evaluator projection alias: `mult(a, b) as c` (Solr's
            # SelectStream "expr as name" form)
            save = self.i
            self._ws()
            m2 = re.match(r"as\s+([^\s,()=]+)", self.s[self.i:], re.I)
            if m2:
                self.i += m2.end()
                node.named["__alias__"] = m2.group(1)
            else:
                self.i = save
            return node
        if not m:
            raise ValueError(f"expected value at {self.s[self.i:self.i+20]!r}")
        self.i += m.end()
        return m.group(0)

    def expr(self) -> StreamExpr:
        self._ws()
        name = self._ident()
        self._ws()
        if self.i >= len(self.s) or self.s[self.i] != "(":
            raise ValueError(f"expected '(' after {name}")
        self.i += 1
        node = StreamExpr(name)
        self._ws()
        if self.i < len(self.s) and self.s[self.i] == ")":
            self.i += 1
            return node
        while True:
            self._ws()
            # named parameter?  ident '=' value (but not inside a call)
            m = re.match(r"([A-Za-z_][\w.]*)\s*=", self.s[self.i:])
            if m and self.s[self.i + m.end():].lstrip()[:1] != "=":
                self.i += m.end()
                node.named[m.group(1)] = self._value()
            else:
                node.args.append(self._value())
            self._ws()
            if self.i < len(self.s) and self.s[self.i] == ",":
                self.i += 1
                continue
            if self.i < len(self.s) and self.s[self.i] == ")":
                self.i += 1
                return node
            raise ValueError(f"expected ',' or ')' at {self.s[self.i:self.i+20]!r}")


def parse_expression(text: str) -> StreamExpr:
    p = _Parser(text.strip())
    node = p.expr()
    p._ws()
    if p.i != len(p.s):
        raise ValueError(f"trailing input: {p.s[p.i:]!r}")
    return node


# --------------------------------------------------------------------------
# factory (StreamFactory.java)
# --------------------------------------------------------------------------

_METRICS = {"sum", "avg", "min", "max", "count"}
_BOOL_OPS = {"eq", "gt", "lt", "gteq", "lteq", "and", "or", "not"}


def _sort_cols(spec: str) -> list[Column]:
    cols = []
    for part in spec.split(","):
        toks = part.split()
        c = F.col(toks[0])
        if len(toks) > 1 and toks[1].lower() == "desc":
            c = c.desc()
        else:
            c = c.asc()
        cols.append(c)
    return cols


class StreamFactory:
    """Evaluate stream expressions over named tables.

    ``tables`` maps collection name → DataFrame; ``searcher`` (optional)
    serves ``search(…, q=…)`` full-text queries for ``search_collection``
    (joined back by doc_id, exactly the /select handler the reference's
    SearchStream wraps)."""

    def __init__(
        self,
        tables: dict[str, DataFrame],
        searcher=None,
        search_collection: str | None = None,
        index=None,
    ) -> None:
        self.tables = tables
        self.searcher = searcher
        self.search_collection = search_collection
        self.index = index  # IndexTables for the search collection
        self._lets: dict[str, DataFrame] = {}

    def _need_index(self, fn: str):
        if self.index is None:
            raise ValueError(f"{fn}() needs StreamFactory(index=…)")
        return self.index

    # ------------------------------------------------------------- entry
    def df(self, expr: str | StreamExpr) -> DataFrame:
        node = parse_expression(expr) if isinstance(expr, str) else expr
        return self._eval(node)

    # ------------------------------------------------------------- eval
    def _eval(self, n: "StreamExpr | str") -> DataFrame:
        if isinstance(n, str):
            raise ValueError(f"expected a stream, got bare value {n!r}")
        h = getattr(self, f"_h_{n.name}", None)
        if h is None:
            raise ValueError(f"unknown stream function {n.name!r}")
        return h(n)

    def _one(self, n: StreamExpr, key: str, default: str | None = None) -> str | None:
        v = n.named.get(key, default)
        if isinstance(v, StreamExpr):
            raise ValueError(f"{key} must be a plain value")
        return v

    # --------------------------------------------------------- leaf
    def _h_search(self, n: StreamExpr) -> DataFrame:
        """SearchStream/CloudSolrStream: q over a collection, project
        fl, sort.  q='*:*' (or absent) scans; a real q needs the
        searcher for this collection."""
        if not n.args or isinstance(n.args[0], StreamExpr):
            raise ValueError("search() needs a collection name")
        table = self.tables[n.args[0]]
        q = self._one(n, "q", "*:*")
        if q != "*:*":
            if self.searcher is None or n.args[0] != self.search_collection:
                raise ValueError(
                    f"search(q={q!r}) needs a text searcher for "
                    f"{n.args[0]!r}"
                )
            hits = self.searcher.docs(q).select("doc_id", "score")
            table = table.join(hits, "doc_id")
        fl = self._one(n, "fl")
        if fl:
            table = table.select(*[c.strip() for c in fl.split(",")])
        sort = self._one(n, "sort")
        if sort:
            table = table.orderBy(*_sort_cols(sort))
        rows = self._one(n, "rows")
        if rows:
            table = table.limit(int(rows))
        return table

    def _h_export(self, n: StreamExpr) -> DataFrame:
        """ExportHandler (/export) as a stream source: the FULL sorted
        result set, no rows cap (solr/handler/export/ExportWriter.java
        — docValues-only fl, mandatory sort; CloudSolrStream with
        qt=/export).  Spark shape: project + global sort — the sort is
        a range-partitioned shuffle, and the projection prunes to the
        fl columns at the scan (docValues ≡ columnar parquet read)."""
        if not n.args or isinstance(n.args[0], StreamExpr):
            raise ValueError("export() needs a collection name")
        table = self.tables[n.args[0]]
        q = self._one(n, "q", "*:*")
        if q != "*:*":
            if self.searcher is None or n.args[0] != self.search_collection:
                raise ValueError(
                    f"export(q={q!r}) needs a text searcher for "
                    f"{n.args[0]!r}"
                )
            hits = self.searcher.docs(q).select("doc_id")
            table = table.join(hits, "doc_id")
        fl = self._one(n, "fl")
        sort = self._one(n, "sort")
        if not fl or not sort:
            # ExportWriter rejects requests without fl/sort (all fields
            # must be docValues; the sort drives the merge iterator)
            raise ValueError("export() requires fl= and sort=")
        table = table.select(*[c.strip() for c in fl.split(",")])
        return table.orderBy(*_sort_cols(sort))

    def _h_jdbc(self, n: StreamExpr) -> DataFrame:
        """JDBCStream (solr/solrj/src/java/org/apache/solr/client/
        solrj/io/stream/JDBCStream.java): connection=<jdbc url>,
        sql=<select>, sort=<spec>, driver=<class> — an external RDBMS
        result set as a stream source.

        Spark shape: ``spark.read.format("jdbc")`` with the WHOLE sql
        pushed down (the ``query`` option — the database executes it,
        Spark reads the cursor), schema inferred from
        ResultSetMetaData exactly as the reference does.  The
        mandatory ``sort`` re-sorts in Spark: JDBCStream trusts the
        query's ORDER BY for merge-compat, but a partitioned JDBC read
        (partitionColumn/lowerBound/upperBound/numPartitions, passed
        through when given) interleaves partitions, so enforcing the
        order here is the distributed-correct reading of the contract.
        The JDBC driver jar must already be on the session classpath
        (spark.jars + spark.driver.extraClassPath at JVM start);
        tests/test_jdbc_stream.py gates the full round-trip in a
        subprocess JVM against an on-disk DuckDB database when a
        driver jar is present on the machine."""
        url = self._one(n, "connection")
        sql = self._one(n, "sql")
        sort = self._one(n, "sort")
        if not url or not sql or not sort:
            raise ValueError("jdbc() requires connection=, sql= and sort=")
        spark = next(iter(self.tables.values())).sparkSession
        reader = spark.read.format("jdbc").option("url", url)
        if self._one(n, "partitionColumn"):
            # Spark's partitioned JDBC scan needs dbtable, not query —
            # wrap the sql as a derived table so ranges can be ANDed in
            reader = reader.option("dbtable", f"({sql}) __jdbc_src")
        else:
            reader = reader.option("query", sql)
        for opt in (
            "driver", "partitionColumn", "lowerBound", "upperBound",
            "numPartitions", "fetchsize",
        ):
            v = self._one(n, opt)
            if v:
                reader = reader.option(opt, v)
        return reader.load().orderBy(*_sort_cols(sort))

    def _h_echo(self, n: StreamExpr) -> DataFrame:
        spark = next(iter(self.tables.values())).sparkSession
        return spark.createDataFrame([(n.args[0],)], ["echo"])

    def _h_tuple(self, n: StreamExpr) -> DataFrame:
        spark = next(iter(self.tables.values())).sparkSession
        keys = list(n.named)
        return spark.createDataFrame([tuple(n.named[k] for k in keys)], keys)

    # --------------------------------------------------- evaluators
    _NUM_LIT = re.compile(r"-?\d+(\.\d+)?([eE]-?\d+)?")
    _EVAL_VARIADIC = {
        "add": lambda a, b: a + b,
        "sub": lambda a, b: a - b,
        "mult": lambda a, b: a * b,
        "div": lambda a, b: a / b,
        "and": lambda a, b: a & b,
        "or": lambda a, b: a | b,
    }
    _EVAL_UNARY = {
        "abs": F.abs, "sqrt": F.sqrt, "log": F.log, "log10": F.log10,
        "ceil": F.ceil, "floor": F.floor, "not": lambda c: ~c,
        "sin": F.sin, "cos": F.cos, "tan": F.tan, "asin": F.asin,
        "acos": F.acos, "atan": F.atan, "sinh": F.sinh, "cosh": F.cosh,
        "tanh": F.tanh, "cbrt": F.cbrt, "exp": F.exp,
    }
    _EVAL_CMP = {
        "eq": lambda a, b: a == b, "gt": lambda a, b: a > b,
        "gte": lambda a, b: a >= b, "lt": lambda a, b: a < b,
        "lte": lambda a, b: a <= b,
    }

    def _eval_col(self, a: "StreamExpr | str") -> Column:
        """StreamEvaluator tree → Column (solrj io/eval/*Evaluator.java
        vocabulary: arithmetic, comparisons, boolean logic, if, round,
        pow, mod) — pure column expressions, whole-stage codegen."""
        if isinstance(a, str):
            if self._NUM_LIT.fullmatch(a):
                return F.lit(float(a) if ("." in a or "e" in a.lower()) else int(a))
            if a in ("true", "false"):
                return F.lit(a == "true")
            return F.col(a)
        name, args = a.name, [self._eval_col(x) for x in a.args]
        if name in self._EVAL_VARIADIC:
            if len(args) < 2:
                raise ValueError(f"{name}() needs >= 2 operands")
            out = args[0]
            for nxt in args[1:]:
                out = self._EVAL_VARIADIC[name](out, nxt)
            return out
        if name in self._EVAL_UNARY:
            (x,) = args
            return self._EVAL_UNARY[name](x)
        if name in self._EVAL_CMP:
            x, y = args
            return self._EVAL_CMP[name](x, y)
        if name == "if":
            c, t, e = args
            return F.when(c, t).otherwise(e)
        if name == "mod":
            return args[0] % args[1]
        if name == "pow":
            return F.pow(args[0], args[1])
        if name == "round":
            scale = int(a.args[1]) if len(a.args) > 1 else 0
            return F.round(args[0], scale)
        raise ValueError(f"unknown stream evaluator {name!r}")

    # --------------------------------------------------------- unary
    def _h_select(self, n: StreamExpr) -> DataFrame:
        src = self._eval(n.args[0])
        cols = []
        for a in n.args[1:]:
            if isinstance(a, StreamExpr):
                alias = a.named.get("__alias__")
                if alias is None:
                    raise ValueError(
                        f"select() evaluator {a.name}(...) needs 'as name'"
                    )
                cols.append(self._eval_col(a).alias(alias))
                continue
            m = re.fullmatch(r"(\S+)\s+as\s+(\S+)", a, re.I)
            cols.append(
                F.col(m.group(1)).alias(m.group(2)) if m else F.col(a)
            )
        return src.select(*cols)

    def _h_sort(self, n: StreamExpr) -> DataFrame:
        by = self._one(n, "by")
        if by is None:
            raise ValueError("sort() needs by=")
        return self._eval(n.args[0]).orderBy(*_sort_cols(by))

    def _h_unique(self, n: StreamExpr) -> DataFrame:
        """UniqueStream: first tuple per ``over`` group of the sorted
        input.  Deterministic Spark shape: row_number over the group
        ordered by the remaining columns."""
        from pyspark.sql import Window

        src = self._eval(n.args[0])
        over = [c.strip() for c in (self._one(n, "over") or "").split(",") if c]
        if not over:
            raise ValueError("unique() needs over=")
        rest = [c for c in src.columns if c not in over]
        w = Window.partitionBy(*over).orderBy(*rest) if rest else Window.partitionBy(*over).orderBy(over[0])
        return (
            src.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _h_top(self, n: StreamExpr) -> DataFrame:
        k = int(self._one(n, "n") or 10)
        sort = self._one(n, "sort")
        if sort is None:
            raise ValueError("top() needs sort=")
        stream = next(a for a in n.args if isinstance(a, StreamExpr))
        return self._eval(stream).orderBy(*_sort_cols(sort)).limit(k)

    def _h_cartesianProduct(self, n: StreamExpr) -> DataFrame:
        src = self._eval(n.args[0])
        fld = n.args[1] if len(n.args) > 1 else self._one(n, "field")
        if fld is None:
            raise ValueError("cartesianProduct() needs a field to explode")
        others = [c for c in src.columns if c != fld]
        return src.select(*others, F.explode(F.col(fld)).alias(fld))

    # --------------------------------------------------------- metrics
    def _metric(self, m: StreamExpr) -> Column:
        if m.name not in _METRICS:
            raise ValueError(f"unknown metric {m.name!r}")
        arg = m.args[0] if m.args else "*"
        ident = f"{m.name}({arg})"
        if m.name == "count":
            return F.count("*" if arg == "*" else F.col(arg)).alias(ident)
        fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[m.name]
        return fn(F.col(arg)).alias(ident)

    def _h_rollup(self, n: StreamExpr) -> DataFrame:
        src = self._eval(n.args[0])
        over = [c.strip() for c in (self._one(n, "over") or "").split(",") if c]
        metrics = [self._metric(a) for a in n.args[1:] if isinstance(a, StreamExpr)]
        if not metrics:
            raise ValueError("rollup() needs at least one metric")
        return src.groupBy(*over).agg(*metrics).orderBy(*over)

    def _h_stats(self, n: StreamExpr) -> DataFrame:
        src = self._eval(n.args[0]) if isinstance(n.args[0], StreamExpr) else self.tables[n.args[0]]
        metrics = [self._metric(a) for a in n.args[1:] if isinstance(a, StreamExpr)]
        return src.agg(*metrics)

    def _h_facet(self, n: StreamExpr) -> DataFrame:
        if isinstance(n.args[0], StreamExpr):
            src = self._eval(n.args[0])
        else:
            src = self.tables[n.args[0]]
        buckets = [
            c.strip() for c in (self._one(n, "buckets") or "").split(",") if c
        ]
        if not buckets:
            raise ValueError("facet() needs buckets=")
        metrics = [self._metric(a) for a in n.args[1:] if isinstance(a, StreamExpr)]
        out = src.groupBy(*buckets).agg(*metrics)
        sorts = self._one(n, "bucketSorts")
        if sorts:
            cols = []
            for part in sorts.split(","):
                toks = part.split()
                c = F.col(toks[0])
                cols.append(
                    c.desc() if len(toks) > 1 and toks[1].lower() == "desc" else c.asc()
                )
            out = out.orderBy(*cols)
        limit = self._one(n, "bucketSizeLimit")
        if limit:
            out = out.limit(int(limit))
        return out

    # --------------------------------------------------------- having
    def _bool_col(self, m: "StreamExpr | str") -> Column:
        if isinstance(m, str):
            raise ValueError(f"expected boolean evaluator, got {m!r}")
        if m.name == "and":
            out = self._bool_col(m.args[0])
            for a in m.args[1:]:
                out = out & self._bool_col(a)
            return out
        if m.name == "or":
            out = self._bool_col(m.args[0])
            for a in m.args[1:]:
                out = out | self._bool_col(a)
            return out
        if m.name == "not":
            return ~self._bool_col(m.args[0])
        if m.name not in _BOOL_OPS:
            raise ValueError(f"unknown boolean evaluator {m.name!r}")
        lhs, rhs = m.args

        def side(v):
            if isinstance(v, StreamExpr):  # nested metric name e.g. count(*)
                return F.col(f"{v.name}({v.args[0] if v.args else '*'})")
            try:
                return F.lit(float(v)) if "." in v else F.lit(int(v))
            except ValueError:
                return F.col(v)

        a, b = side(lhs), side(rhs)
        return {
            "eq": a == b,
            "gt": a > b,
            "lt": a < b,
            "gteq": a >= b,
            "lteq": a <= b,
        }[m.name]

    def _h_having(self, n: StreamExpr) -> DataFrame:
        src = self._eval(n.args[0])
        return src.filter(self._bool_col(n.args[1]))

    # --------------------------------------------------------- binary
    @staticmethod
    def _on_pairs(on: str) -> list[tuple[str, str]]:
        pairs = []
        for part in on.split(","):
            part = part.strip()
            if "=" in part:
                a, b = part.split("=", 1)
                pairs.append((a.strip(), b.strip()))
            else:
                pairs.append((part, part))
        return pairs

    def _join(self, n: StreamExpr, how: str) -> DataFrame:
        left, right = (self._eval(a) for a in n.args[:2])
        on = self._one(n, "on")
        if on is None:
            raise ValueError("join needs on=")
        pairs = self._on_pairs(on)
        cond = None
        for a, b in pairs:
            c = left[a] == right[b]
            cond = c if cond is None else cond & c
        out = left.join(right, cond, how)
        if how in ("inner", "left_outer"):
            # drop the duplicated right-side key columns (JoinStream
            # emits one merged tuple)
            for a, b in pairs:
                if b in right.columns and a == b:
                    out = out.drop(right[b])
        return out

    def _h_innerJoin(self, n: StreamExpr) -> DataFrame:
        return self._join(n, "inner")

    def _h_leftOuterJoin(self, n: StreamExpr) -> DataFrame:
        return self._join(n, "left_outer")

    def _h_hashJoin(self, n: StreamExpr) -> DataFrame:
        """HashJoinStream builds a hash table of the hashed= side; the
        declarative analog marks that side broadcastable and lets
        Catalyst pick broadcast-hash when it fits."""
        left, right = (self._eval(a) for a in n.args[:2])
        on = self._one(n, "on")
        if on is None:
            raise ValueError("hashJoin needs on=")
        pairs = self._on_pairs(on)
        cond = None
        for a, b in pairs:
            c = left[a] == right[b]
            cond = c if cond is None else cond & c
        out = left.join(F.broadcast(right), cond, "inner")
        for a, b in pairs:
            if a == b:
                out = out.drop(right[b])
        return out

    def _h_merge(self, n: StreamExpr) -> DataFrame:
        on = self._one(n, "on")
        if on is None:
            raise ValueError("merge() needs on=")
        streams = [self._eval(a) for a in n.args if isinstance(a, StreamExpr)]
        out = streams[0]
        for s in streams[1:]:
            out = out.unionByName(s)
        return out.orderBy(*_sort_cols(on))

    def _h_intersect(self, n: StreamExpr) -> DataFrame:
        left, right = (self._eval(a) for a in n.args[:2])
        on = self._one(n, "on")
        pairs = self._on_pairs(on or "")
        cond = None
        for a, b in pairs:
            c = left[a] == right[b]
            cond = c if cond is None else cond & c
        return left.join(right, cond, "left_semi")

    def _h_complement(self, n: StreamExpr) -> DataFrame:
        left, right = (self._eval(a) for a in n.args[:2])
        on = self._one(n, "on")
        pairs = self._on_pairs(on or "")
        cond = None
        for a, b in pairs:
            c = left[a] == right[b]
            cond = c if cond is None else cond & c
        return left.join(right, cond, "left_anti")

    def _h_fetch(self, n: StreamExpr) -> DataFrame:
        """FetchStream: decorate stream tuples with fl fields fetched
        from a collection by key (batched lookups → a plain equi-join;
        broadcast the stream side when small is Catalyst's call)."""
        table_name = next(a for a in n.args if not isinstance(a, StreamExpr))
        stream = next(a for a in n.args if isinstance(a, StreamExpr))
        src = self._eval(stream)
        table = self.tables[table_name]
        on = self._one(n, "on")
        if on is None:
            raise ValueError("fetch() needs on=")
        (a, b), = self._on_pairs(on)
        fl = [c.strip() for c in (self._one(n, "fl") or "").split(",") if c]
        proj = table.select(F.col(b).alias("_fk"), *[c for c in fl if c != b])
        return src.join(proj, src[a] == proj["_fk"], "left_outer").drop("_fk")

    # --------------------------------------------------------- let/get
    def _h_let(self, n: StreamExpr) -> DataFrame:
        """LetStream: bind named streams, evaluate the body with the
        bindings visible to get()."""
        saved = dict(self._lets)
        try:
            for k, v in n.named.items():
                self._lets[k] = self._eval(v) if isinstance(v, StreamExpr) else self.tables[v]
            if not n.args:
                raise ValueError("let() needs a body stream")
            return self._eval(n.args[-1])
        finally:
            self._lets = saved

    def _h_get(self, n: StreamExpr) -> DataFrame:
        name = n.args[0]
        if name not in self._lets:
            raise ValueError(f"get({name!r}): no such let binding")
        return self._lets[name]

    # --------------------------------------------------------- plumbing
    def _h_null(self, n: StreamExpr) -> DataFrame:
        """NullStream (io/stream/NullStream.java): drain the inner
        stream and emit a single tuple with the tuple count.  The
        reference emits ``nullCount`` + ``timer``; ``timer`` is
        wall-clock and therefore omitted (kept deterministic).  The
        drain is a distributed count — never a collect."""
        src = self._eval(n.args[0])
        return src.agg(F.count(F.lit(1)).alias("nullCount"))

    def _h_list(self, n: StreamExpr) -> DataFrame:
        """ListStream (io/stream/ListStream.java): emit each inner
        stream's tuples in stream order.  Relationally a union with
        missing columns null-filled (the reference's tuples are
        schemaless maps); arg order is preserved per-partition, and
        callers that need a total order sort downstream as in the
        reference's own examples."""
        streams = [self._eval(a) for a in n.args if isinstance(a, StreamExpr)]
        if not streams:
            raise ValueError("list() needs at least one stream")
        out = streams[0]
        for s in streams[1:]:
            out = out.unionByName(s, allowMissingColumns=True)
        return out

    # ParallelListStream opens its inner streams concurrently; the plan
    # is identical — concurrency of *execution* is Spark's scheduler's
    # job, which runs union legs in parallel anyway.
    _h_plist = _h_list

    def _h_eval(self, n: StreamExpr) -> DataFrame:
        """EvalStream (io/stream/EvalStream.java): read the FIRST tuple
        of the inner stream, parse its ``expr_s`` field as a stream
        expression, and emit that stream.  The one-tuple read is
        driver-side by contract (the reference reads exactly one tuple
        too)."""
        src = self._eval(n.args[0])
        if "expr_s" not in src.columns:
            raise ValueError("eval(): inner stream has no expr_s field")
        first = src.select("expr_s").head()
        if first is None or first["expr_s"] is None:
            raise ValueError("eval(): inner stream has no expr_s tuple")
        return self.df(first["expr_s"])

    def _h_reduce(self, n: StreamExpr) -> DataFrame:
        """ReducerStream + GroupOperation (io/stream/ReducerStream.java,
        ops/GroupOperation.java): group the sorted input by ``by`` and
        keep each group's top ``n`` tuples under the group sort — a
        ranked window, the Catalyst plan for sort+group-adjacent
        reduce."""
        from pyspark.sql import Window

        src = self._eval(n.args[0])
        by = [c.strip() for c in (self._one(n, "by") or "").split(",") if c]
        if not by:
            raise ValueError("reduce() needs by=")
        grp = next(
            (a for a in n.args[1:] if isinstance(a, StreamExpr) and a.name == "group"),
            None,
        )
        if grp is None:
            raise ValueError("reduce() needs a group(sort=, n=) operation")
        sort = grp.named.get("sort")
        if not isinstance(sort, str):
            raise ValueError("group() needs sort=")
        k = int(grp.named.get("n", "1"))
        w = Window.partitionBy(*by).orderBy(*_sort_cols(sort))
        return (
            src.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
            .orderBy(*by)
        )

    def _h_parallel(self, n: StreamExpr) -> DataFrame:
        """ParallelStream (io/stream/ParallelStream.java): send the
        wrapped expression to N workers, each hash-filtered on partition
        keys.  Spark's shuffle IS this machinery — the relational result
        equals the wrapped stream; ``workers``/``partitionKeys`` map to
        an explicit repartition so the downstream plan runs with the
        requested parallelism."""
        inner = next(a for a in n.args if isinstance(a, StreamExpr))
        out = self._eval(inner)
        workers = self._one(n, "workers")
        keys = [
            c.strip()
            for c in (self._one(n, "partitionKeys") or "").split(",")
            if c
        ]
        if workers and keys:
            return out.repartition(int(workers), *[F.col(k) for k in keys])
        if workers:
            return out.repartition(int(workers))
        return out

    def _h_random(self, n: StreamExpr) -> DataFrame:
        """RandomStream (io/stream/RandomStream.java): pseudo-random
        rows-sized sample.  Deterministic under a ``seed`` param
        (engine-reproducible ordering via xxhash64(keys, seed), the
        md5-derived-fingerprint discipline of doc_fingerprint)."""
        if not n.args or isinstance(n.args[0], StreamExpr):
            raise ValueError("random() needs a collection name")
        src = self.tables[n.args[0]]
        rows = int(self._one(n, "rows") or 10)
        seed = int(self._one(n, "seed") or 0)
        fl = self._one(n, "fl")
        if fl:
            src = src.select(*[c.strip() for c in fl.split(",")])
        return (
            src.withColumn(
                "_r", F.xxhash64(F.struct(*src.columns), F.lit(seed))
            )
            .orderBy("_r")
            .limit(rows)
            .drop("_r")
        )

    def _h_timeseries(self, n: StreamExpr) -> DataFrame:
        """TimeSeriesStream (io/stream/TimeSeriesStream.java): tumbling
        calendar windows over ``field``; gap units DAY/HOUR/MONTH map
        onto date_trunc buckets (the partial+final agg plan)."""
        if not n.args or isinstance(n.args[0], StreamExpr):
            raise ValueError("timeseries() needs a collection name")
        src = self.tables[n.args[0]]
        field = self._one(n, "field")
        if field is None:
            raise ValueError("timeseries() needs field=")
        gap = (self._one(n, "gap") or "+1DAY").upper()
        unit, fmt = {
            "+1DAY": ("day", "yyyy-MM-dd"),
            "+1HOUR": ("hour", "yyyy-MM-dd HH"),
            "+1MONTH": ("month", "yyyy-MM"),
            "+1YEAR": ("year", "yyyy"),
        }.get(gap, ("day", "yyyy-MM-dd"))
        start, end = self._one(n, "start"), self._one(n, "end")
        if start:
            src = src.filter(F.col(field) >= start)
        if end:
            src = src.filter(F.col(field) < end)
        metrics = [
            self._metric(a) for a in n.args[1:] if isinstance(a, StreamExpr)
        ]
        if not metrics:
            metrics = [F.count("*").alias("count(*)")]
        bucket = F.date_format(
            F.date_trunc(unit, F.col(field)), fmt
        ).alias(field)
        return src.groupBy(bucket).agg(*metrics).orderBy(field)

    def _h_nodes(self, n: StreamExpr) -> DataFrame:
        """GatherNodesStream (io/stream/graph/GatherNodesStream.java):
        nodes(collection, rootStream|root=, walk="from->to",
        maxHops=) — breadth-first unique-node expansion over the
        collection's edge relation (streaming/graph.py)."""
        from lucene_solr_spark.streaming.graph import gather_nodes

        if not n.args or isinstance(n.args[0], StreamExpr):
            raise ValueError("nodes() needs an edge collection name")
        edges = self.tables[n.args[0]]
        walk = self._one(n, "walk")
        if walk is None or "->" not in walk:
            raise ValueError('nodes() needs walk="fromCol->toCol"')
        from_col, to_col = (c.strip() for c in walk.split("->", 1))
        inner = next((a for a in n.args[1:] if isinstance(a, StreamExpr)), None)
        if inner is not None:
            src = self._eval(inner)
            roots = src.select(F.col(src.columns[0]).alias("node"))
        else:
            root = self._one(n, "root")
            if root is None:
                raise ValueError("nodes() needs a root stream or root=")
            spark = edges.sparkSession
            roots = spark.createDataFrame(
                [(v.strip(),) for v in root.split(",")], ["node"]
            ).select(F.col("node").cast(dict(edges.dtypes)[from_col]))
        hops = int(self._one(n, "maxHops") or 1)
        return gather_nodes(edges, roots, from_col, to_col, hops).orderBy(
            "level", "node"
        )

    def _h_shortestPath(self, n: StreamExpr) -> DataFrame:
        """ShortestPathStream (io/stream/graph/ShortestPathStream.java):
        shortestPath(collection, from=, to=, edge="from->to",
        maxDepth=) — emits one tuple with the BFS level distance (or no
        tuples when unreachable)."""
        from lucene_solr_spark.streaming.graph import shortest_path

        if not n.args or isinstance(n.args[0], StreamExpr):
            raise ValueError("shortestPath() needs an edge collection")
        edges = self.tables[n.args[0]]
        edge = self._one(n, "edge")
        if edge is None or "->" not in edge:
            raise ValueError('shortestPath() needs edge="fromCol->toCol"')
        from_col, to_col = (c.strip() for c in edge.split("->", 1))
        src_v, dst_v = self._one(n, "from"), self._one(n, "to")
        if src_v is None or dst_v is None:
            raise ValueError("shortestPath() needs from= and to=")
        ftype = dict(edges.dtypes)[from_col]
        if ftype in ("bigint", "int", "long", "smallint"):
            src_v, dst_v = int(src_v), int(dst_v)
        dist = shortest_path(
            edges, src_v, dst_v, from_col, to_col,
            max_hops=int(self._one(n, "maxDepth") or 6),
        )
        spark = edges.sparkSession
        rows = [] if dist is None else [(src_v, dst_v, dist)]
        return spark.createDataFrame(
            rows, f"from_ {ftype}, to_ {ftype}, level int"
        )

    # --------------------------------------------------------- ML / stats
    def _h_significantTerms(self, n: StreamExpr) -> DataFrame:
        """SignificantTermsStream (solrj io/stream/SignificantTermsStream
        .java): significantTerms(collection, q=, limit=, minDocFreq=) —
        foreground (q's doc set) vs background (whole index) term
        frequency ratio.  Emits (term, foreground, background, score)
        ordered by score desc, term asc — one postings shuffle for the
        foreground counts, term_stats broadcast for the background."""
        t = self._need_index("significantTerms")
        q = self._one(n, "q")
        if q is None:
            raise ValueError("significantTerms() needs q=")
        if self.searcher is None:
            raise ValueError("significantTerms() needs a searcher")
        fg = self.searcher.docs(q).select("doc_id")
        fg_n = fg.count()
        out = (
            t.postings.join(fg, "doc_id")
            .groupBy("term")
            .agg(F.count("*").alias("foreground"))
            .join(
                t.term_stats.select(
                    "term", F.col("df").alias("background")
                ),
                "term",
            )
            .withColumn(
                "score",
                F.round(
                    (F.col("foreground") / F.lit(float(fg_n)))
                    / (F.col("background") / F.lit(float(t.stats.doc_count))),
                    4,
                ),
            )
        )
        min_df = int(self._one(n, "minDocFreq") or 0)
        if min_df:
            out = out.filter(F.col("background") >= min_df)
        out = out.orderBy(F.col("score").desc(), F.col("term").asc())
        limit = self._one(n, "limit")
        return out.limit(int(limit)) if limit else out

    def _binary_outcomes(self, n: StreamExpr, collection: str) -> DataFrame:
        outcome = self._one(n, "outcome")
        if outcome is None:
            raise ValueError(f"{n.name}() needs outcome=")
        pos = self._one(n, "positiveLabel", "1")
        idc = self._one(n, "id", "doc_id")
        return self.tables[collection].select(
            F.col(idc).alias("doc_id"),
            F.when(F.col(outcome).cast("string") == pos, 1)
            .otherwise(0)
            .alias("outcome"),
        )

    def _h_featuresSelection(self, n: StreamExpr) -> DataFrame:
        """FeaturesSelectionStream (solrj io/stream/FeaturesSelection
        Stream.java:340-370): featuresSelection(collection, outcome=,
        positiveLabel=, numTerms=) — top terms by information gain
        (IGainTermsQParserPlugin math) → (term, score, docfreq, idf)."""
        from lucene_solr_spark.streaming.ml import features_selection

        t = self._need_index("featuresSelection")
        if not n.args or isinstance(n.args[0], StreamExpr):
            raise ValueError("featuresSelection() needs a collection")
        return features_selection(
            t.postings,
            self._binary_outcomes(n, n.args[0]),
            num_terms=int(self._one(n, "numTerms") or 10),
        )

    def _model_from_features(self, feats: DataFrame, n_docs: int):
        """Collect a bounded (numTerms-capped) feature set → (terms,
        idfs); idf recomputed from docfreq so the model sees full
        precision, not the stream's display rounding."""
        import math

        rows = feats.select("term", "docfreq").collect()
        terms = [r["term"] for r in rows]
        idfs = [math.log(n_docs / (r["docfreq"] + 1.0)) for r in rows]
        return terms, idfs

    def _h_train(self, n: StreamExpr) -> DataFrame:
        """TextLogitStream (solrj io/stream/TextLogitStream.java):
        train(collection, featuresExpr, outcome=, maxIterations=,
        alpha=) — logistic regression over idf·(1+ln tf) term features.
        The per-iteration model tuple is FLATTENED to one row per
        weight: (iteration, idx, term, weight, error); idx 0 is the
        intercept (term null).  classify() consumes this shape."""
        from lucene_solr_spark.streaming.ml import text_logit

        t = self._need_index("train")
        if not n.args or isinstance(n.args[0], StreamExpr):
            raise ValueError("train() needs a collection")
        inner = next(
            (a for a in n.args[1:] if isinstance(a, StreamExpr)), None
        )
        if inner is None:
            raise ValueError("train() needs a features stream")
        outcomes = self._binary_outcomes(n, n.args[0])
        n_docs = outcomes.count()
        terms, idfs = self._model_from_features(self._eval(inner), n_docs)
        iters = text_logit(
            t.postings,
            outcomes,
            terms,
            idfs,
            iterations=int(self._one(n, "maxIterations") or 10),
            alpha=float(self._one(n, "alpha") or 0.01),
        )
        spark = outcomes.sparkSession
        rows = []
        for it in iters:
            names = [None] + terms
            fidfs = [None] + idfs
            for idx, w in enumerate(it.weights):
                rows.append(
                    (it.iteration, idx, names[idx], fidfs[idx], w, it.error)
                )
        return spark.createDataFrame(
            rows,
            "iteration int, idx int, term string, idf double, "
            "weight double, error double",
        )

    def _h_classify(self, n: StreamExpr) -> DataFrame:
        """ClassifyStream (solr/handler/ClassifyStream.java:136-185):
        classify(modelExpr, collection) — score every doc of the
        collection under the model stream's LAST iteration:
        probability = sigmoid(total), score = total·(float)(1/√len).
        The model collect is bounded by the feature-set size."""
        from lucene_solr_spark.streaming.ml import classify

        t = self._need_index("classify")
        inner = next(
            (a for a in n.args if isinstance(a, StreamExpr)), None
        )
        if inner is None:
            raise ValueError("classify() needs a model stream")
        model = self._eval(inner)
        last = model.orderBy(
            F.col("iteration").desc(), F.col("idx").asc()
        ).collect()
        top_iter = last[0]["iteration"]
        rows = [r for r in last if r["iteration"] == top_iter]
        weights = [r["weight"] for r in rows]
        terms = [r["term"] for r in rows[1:]]
        idfs = [r["idf"] for r in rows[1:]]
        return classify(t.postings, t.doc_norms, terms, idfs, weights)

    def _h_scoreNodes(self, n: StreamExpr) -> DataFrame:
        """ScoreNodesStream (solrj io/stream/ScoreNodesStream.java:
        226-245): scoreNodes(nodes(...)) — tf-idf over the inner
        traversal's nodes; termFreq = reach multiplicity, docFreq =
        the node's frequency over the whole edge relation.  The inner
        expression is introspected (collection + walk) for the stats
        relation, mirroring the reference's index-stats lookup; one
        hop only (the counted-frontier shape)."""
        from lucene_solr_spark.streaming.graph import (
            gather_counts,
            score_nodes,
        )

        inner = next(
            (a for a in n.args if isinstance(a, StreamExpr)), None
        )
        if inner is None or inner.name != "nodes":
            raise ValueError("scoreNodes() needs an inner nodes() stream")
        if int(self._one(inner, "maxHops") or 1) != 1:
            raise ValueError("scoreNodes() supports maxHops=1 traversals")
        edges = self.tables[inner.args[0]]
        walk = self._one(inner, "walk")
        from_col, to_col = (c.strip() for c in walk.split("->", 1))
        root = self._one(inner, "root")
        if root is None:
            raise ValueError("scoreNodes() needs the inner root=")
        spark = edges.sparkSession
        roots = spark.createDataFrame(
            [(v.strip(),) for v in root.split(",")], ["node"]
        ).select(F.col("node").cast(dict(edges.dtypes)[from_col]))
        nodes = gather_counts(edges, roots, from_col, to_col)
        df_ = edges.groupBy(F.col(to_col).alias("node")).agg(
            F.count("*").alias("docfreq")
        )
        return score_nodes(nodes, df_, edges.count())

    def _h_update(self, n: StreamExpr) -> DataFrame:
        """UpdateStream (io/stream/UpdateStream.java): drain the inner
        stream into the named collection and emit one ``batchIndexed``
        ack tuple.  The collection is the factory's table registry —
        the durable form is the segment writer's df.write paths
        (index/segments.py); this is the language-level sink."""
        if not n.args or isinstance(n.args[0], StreamExpr):
            raise ValueError("update() needs a destination collection")
        dest = n.args[0]
        inner = next(a for a in n.args[1:] if isinstance(a, StreamExpr))
        src = self._eval(inner)
        existing = self.tables.get(dest)
        self.tables[dest] = (
            src
            if existing is None
            else existing.unionByName(src, allowMissingColumns=True)
        )
        count = src.count()
        spark = src.sparkSession
        return spark.createDataFrame([(count,)], "batchIndexed bigint")

    def _h_commit(self, n: StreamExpr) -> DataFrame:
        """CommitStream (io/stream/CommitStream.java): wraps update(),
        passing its ack tuples through; the durability point is the
        segment manifest's atomic-rename commit (index/segments.py),
        owned by the index writer rather than this relational layer."""
        inner = next(a for a in n.args if isinstance(a, StreamExpr))
        return self._eval(inner)

    def _h_sql(self, n: StreamExpr) -> DataFrame:
        """SqlStream / the Solr SQL handler (solr/handler/sql/ — Calcite
        over Solr collections): stmt= runs against the factory's tables
        registered as temp views.  Spark SQL *is* the reference's
        Calcite layer here — same SELECT surface, Catalyst optimizes."""
        stmt = self._one(n, "stmt")
        if stmt is None:
            raise ValueError("sql() needs stmt=")
        spark = next(iter(self.tables.values())).sparkSession
        for name, t in self.tables.items():
            t.createOrReplaceTempView(name)
        return spark.sql(stmt)

    def _h_daemon(self, n: StreamExpr) -> DataFrame:
        """DaemonStream (io/stream/DaemonStream.java): one iteration of
        the wrapped stream.  The reference's run-loop (id, runInterval,
        queue) is scheduling, owned here by the host's trigger —
        Structured Streaming or a cron over TopicCursor
        (streaming/topic.py) for the daemon+topic incremental pattern."""
        inner = next(a for a in n.args if isinstance(a, StreamExpr))
        return self._eval(inner)
