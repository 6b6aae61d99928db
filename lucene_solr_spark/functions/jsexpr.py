"""Lucene expressions module: the JavaScript expression compiler.

Reference: ``lucene/expressions/src/java/org/apache/lucene/
expressions/js/JavascriptCompiler.java`` (ASM bytecode compiler over
the ANTLR grammar ``Javascript.g4``) and ``ExpressionRescorer.java``.

The reference compiles an expression string to JVM bytecode producing
one double per doc.  Here the same grammar compiles to a Spark
``Column`` tree, so the expression is evaluated JVM-side inside
whole-stage codegen — the Spark-native analogue of Lucene's bytecode
compilation (no Python in the loop, Catalyst sees the whole
arithmetic tree and can constant-fold it).

Language surface (package-info.java:17-41):
  - int / float / hex (``0x``) / octal (``0nnn``) literals
  - arithmetic  ``+ - * / %``
  - bitwise     ``| & ^ ~ << >> >>>``  (operands cast to long,
    result back to double — JavascriptCompiler pushes J2D/D2J)
  - boolean     ``&& || !`` and the ternary ``?:`` (truthiness of a
    double is ``!= 0``; results are 1.0 / 0.0)
  - comparison  ``< <= == != >= >``
  - functions   the DEFAULT_FUNCTIONS table
    (JavascriptCompiler.properties): abs acos acosh asin asinh atan
    atan2 atanh ceil cos cosh exp floor haversin ln log10 logn max
    min pow sin sinh sqrt tan tanh
  - free variables resolved through ``bindings`` (Bindings.java /
    SimpleBindings.java) — identifiers may contain ``.`` members and
    ``['...']`` / ``[n]`` element suffixes (VariableContext.java);
    the full spelled form is the binding key.

Divergence note: Spark SQL orders NaN above all doubles and treats
``NaN == NaN`` as true, where Java comparison bytecodes yield false —
expressions whose *inputs* are NaN can compare differently.
"""
from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["compile_expression", "expression_rescore", "JSExprError"]


class JSExprError(ValueError):
    """Raised on a parse error (the compiler's ParseException)."""


# --------------------------------------------------------------- lexer

_PUNCT = [
    "<<", ">>>", ">>", "<=", ">=", "==", "!=", "&&", "||",
    "(", ")", ",", "?", ":", "+", "-", "*", "/", "%", "~", "!",
    "&", "|", "^", "<", ">",
]


def _lex(src: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            if c == "0" and i + 1 < n and src[i + 1] in "xX":
                j = i + 2
                while j < n and src[j] in "0123456789abcdefABCDEF":
                    j += 1
                toks.append(("num", float(int(src[i:j], 16))))
                i = j
                continue
            isfloat = False
            while j < n and (src[j].isdigit() or src[j] in ".eE" or (
                src[j] in "+-" and src[j - 1] in "eE"
            )):
                if src[j] in ".eE":
                    isfloat = True
                j += 1
            text = src[i:j]
            if not isfloat and text.startswith("0") and len(text) > 1:
                toks.append(("num", float(int(text, 8))))  # octal literal
            else:
                toks.append(("num", float(text)))
            i = j
            continue
        if c.isalpha() or c == "_" or c == "$":
            j = i
            # identifier with member / element suffixes
            while j < n and (src[j].isalnum() or src[j] in "_$."):
                j += 1
            name = src[i:j]
            i = j
            while i < n and src[i] == "[":
                k = src.index("]", i)
                name += src[i : k + 1]
                i = k + 1
            toks.append(("id", name))
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(("op", p))
                i += len(p)
                break
        else:
            raise JSExprError(f"unexpected character {c!r} at {i}")
    toks.append(("eof", None))
    return toks


# ------------------------------------------------------------- parser

def _d(c: Column) -> Column:
    return c.cast("double")


def _bool(c: Column) -> Column:
    """Truthiness of a double (JavascriptCompiler pushes DNE 0)."""
    return c != F.lit(0.0)


def _long2(f: Callable[[Column, Column], Column]):
    return lambda a, b: _d(f(a.cast("bigint"), b.cast("bigint")))


def _haversin(lat1, lon1, lat2, lon2) -> Column:
    from lucene_solr_spark.functions.valuesource import geodist_km

    return geodist_km(lat1, lon1, lat2, lon2)


_FUNCS: dict[str, tuple[int, Callable[..., Column]]] = {
    # name -> (arity, builder); table = JavascriptCompiler.properties
    "abs": (1, F.abs),
    "acos": (1, F.acos),
    "acosh": (1, F.acosh),
    "asin": (1, F.asin),
    "asinh": (1, F.asinh),
    "atan": (1, F.atan),
    "atan2": (2, F.atan2),
    "atanh": (1, F.atanh),
    "ceil": (1, lambda x: _d(F.ceil(x))),
    "cos": (1, F.cos),
    "cosh": (1, F.cosh),
    "exp": (1, F.exp),
    "floor": (1, lambda x: _d(F.floor(x))),
    "haversin": (4, _haversin),
    "ln": (1, F.log),
    "log10": (1, F.log10),
    # MathUtil.log(base, x) = ln(x)/ln(base)
    "logn": (2, lambda base, x: F.log(x) / F.log(base)),
    "max": (2, F.greatest),
    "min": (2, F.least),
    "pow": (2, F.pow),
    "sin": (1, F.sin),
    "sinh": (1, F.sinh),
    "sqrt": (1, F.sqrt),
    "tan": (1, F.tan),
    "tanh": (1, F.tanh),
}


class _Parser:
    def __init__(self, toks, bindings: Mapping[str, Column]):
        self.toks = toks
        self.pos = 0
        self.bindings = bindings

    def peek(self):
        return self.toks[self.pos]

    def eat(self, kind=None, val=None):
        k, v = self.toks[self.pos]
        if (kind and k != kind) or (val is not None and v != val):
            raise JSExprError(f"expected {val or kind}, got {v!r}")
        self.pos += 1
        return v

    def at_op(self, *ops) -> str | None:
        k, v = self.peek()
        return v if k == "op" and v in ops else None

    # precedence ladder, lowest first (Javascript.g4 rule order)
    def expression(self) -> Column:
        return self.conditional()

    def conditional(self) -> Column:
        cond = self.logical_or()
        if self.at_op("?"):
            self.eat("op", "?")
            then = self.conditional()
            self.eat("op", ":")
            other = self.conditional()
            return F.when(_bool(cond), then).otherwise(other)
        return cond

    def logical_or(self) -> Column:
        left = self.logical_and()
        while self.at_op("||"):
            self.eat("op", "||")
            right = self.logical_and()
            left = F.when(_bool(left) | _bool(right), 1.0).otherwise(0.0)
        return left

    def logical_and(self) -> Column:
        left = self.bit_or()
        while self.at_op("&&"):
            self.eat("op", "&&")
            right = self.bit_or()
            left = F.when(_bool(left) & _bool(right), 1.0).otherwise(0.0)
        return left

    def bit_or(self) -> Column:
        left = self.bit_xor()
        while self.at_op("|"):
            self.eat("op", "|")
            left = _long2(lambda a, b: a.bitwiseOR(b))(left, self.bit_xor())
        return left

    def bit_xor(self) -> Column:
        left = self.bit_and()
        while self.at_op("^"):
            self.eat("op", "^")
            left = _long2(lambda a, b: a.bitwiseXOR(b))(left, self.bit_and())
        return left

    def bit_and(self) -> Column:
        left = self.equality()
        while self.at_op("&"):
            self.eat("op", "&")
            left = _long2(lambda a, b: a.bitwiseAND(b))(left, self.equality())
        return left

    def equality(self) -> Column:
        left = self.relational()
        while (op := self.at_op("==", "!=")) is not None:
            self.eat("op", op)
            right = self.relational()
            cond = (left == right) if op == "==" else (left != right)
            left = F.when(cond, 1.0).otherwise(0.0)
        return left

    def relational(self) -> Column:
        left = self.shift()
        while (op := self.at_op("<", "<=", ">", ">=")) is not None:
            self.eat("op", op)
            right = self.shift()
            cond = {
                "<": left < right,
                "<=": left <= right,
                ">": left > right,
                ">=": left >= right,
            }[op]
            left = F.when(cond, 1.0).otherwise(0.0)
        return left

    def shift(self) -> Column:
        left = self.additive()
        while (op := self.at_op("<<", ">>", ">>>")) is not None:
            self.eat("op", op)
            right = self.additive()
            fn = {"<<": "shiftleft", ">>": "shiftright",
                  ">>>": "shiftrightunsigned"}[op]
            # Java long shifts mask the count to 6 bits (JLS 15.19)
            left = _d(
                F.call_function(
                    fn,
                    left.cast("bigint"),
                    (right.cast("bigint").bitwiseAND(F.lit(63))).cast("int"),
                )
            )
        return left

    def additive(self) -> Column:
        left = self.multiplicative()
        while (op := self.at_op("+", "-")) is not None:
            self.eat("op", op)
            right = self.multiplicative()
            left = left + right if op == "+" else left - right
        return left

    def multiplicative(self) -> Column:
        left = self.unary()
        while (op := self.at_op("*", "/", "%")) is not None:
            self.eat("op", op)
            right = self.unary()
            if op == "*":
                left = left * right
            elif op == "/":
                # Java double division: x/0 -> +-Inf, 0/0 -> NaN
                left = F.when(
                    right != F.lit(0.0), _d(left) / right
                ).otherwise(
                    F.when(
                        _d(left) > 0, F.lit(float("inf"))
                    ).when(
                        _d(left) < 0, F.lit(float("-inf"))
                    ).otherwise(F.lit(float("nan")))
                )
            else:
                # Java double remainder: x % 0 -> NaN
                left = F.when(
                    right != F.lit(0.0), _d(left) % right
                ).otherwise(F.lit(float("nan")))
        return left

    def unary(self) -> Column:
        if (op := self.at_op("+", "-", "!", "~")) is not None:
            self.eat("op", op)
            v = self.unary()
            if op == "+":
                return _d(v)
            if op == "-":
                return -_d(v)
            if op == "!":
                return F.when(_bool(v), 0.0).otherwise(1.0)
            return _d(
                v.cast("bigint").bitwiseXOR(F.lit(-1).cast("bigint"))
            )
        return self.primary()

    def primary(self) -> Column:
        k, v = self.peek()
        if k == "num":
            self.eat("num")
            return F.lit(float(v))
        if k == "op" and v == "(":
            self.eat("op", "(")
            e = self.expression()
            self.eat("op", ")")
            return e
        if k == "id":
            self.eat("id")
            if self.at_op("("):
                self.eat("op", "(")
                args = []
                if not self.at_op(")"):
                    args.append(self.expression())
                    while self.at_op(","):
                        self.eat("op", ",")
                        args.append(self.expression())
                self.eat("op", ")")
                if v not in _FUNCS:
                    raise JSExprError(f"unknown function {v}")
                arity, fn = _FUNCS[v]
                if len(args) != arity:
                    raise JSExprError(
                        f"{v} expects {arity} args, got {len(args)}"
                    )
                return _d(fn(*args))
            if v not in self.bindings:
                raise JSExprError(f"unbound variable {v!r}")
            return _d(self.bindings[v])
        raise JSExprError(f"unexpected token {v!r}")


def compile_expression(
    source: str, bindings: Mapping[str, Column]
) -> Column:
    """Compile a Lucene JS expression to a double-typed Spark Column.

    ``bindings`` plays the role of SimpleBindings: every free
    variable in ``source`` (including ``a.b`` / ``a['b']`` spellings)
    must map to a Column.
    """
    p = _Parser(_lex(source), bindings)
    col = p.expression()
    if p.peek()[0] != "eof":
        raise JSExprError(f"trailing input at token {p.peek()[1]!r}")
    return _d(col)


def expression_rescore(
    main,
    features,
    source: str,
    feature_cols: list[str],
    rerank_docs: int = 50,
    k: int = 10,
):
    """ExpressionRescorer.java: re-sort the first pass's top
    ``rerank_docs`` hits by the compiled expression (SortRescorer
    semantics — the expression VALUE becomes the second-pass score).

    ``main`` carries (doc_id, score); the original score binds as
    ``_score`` (ExpressionRescorer.scores / Bindings.java:34-38);
    missing feature values bind as 0.
    """
    window = main.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(rerank_docs)
    joined = window.join(features, "doc_id", "left")
    bindings: dict[str, Column] = {"_score": F.col("score").cast("double")}
    for c in feature_cols:
        bindings[c] = F.coalesce(F.col(c).cast("double"), F.lit(0.0))
    ex = compile_expression(source, bindings)
    return (
        joined.select("doc_id", ex.alias("_expr"))
        .orderBy(F.col("_expr").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", F.round("_expr", 4).alias("expr_score"))
    )
