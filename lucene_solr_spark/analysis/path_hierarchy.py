"""PathHierarchyTokenizer — hierarchical path prefixes as tokens.

Reference: analysis/path/PathHierarchyTokenizer.java (:38-150) and its
complete test-vector set (TestPathHierarchyTokenizer.java:28-200):
``/a/b/c`` → ``/a``, ``/a/b``, ``/a/b/c`` (all at ONE position —
posInc 1 then 0), trailing delimiters produce a final
delimiter-terminated token, a bare delimiter tokenizes to itself, the
``replacement`` char substitutes the delimiter in the OUTPUT, and
``skip`` drops the first N tokens and strips the dropped prefix from
the rest (``/a/b/c`` skip=1 → ``/b``, ``/b/c``).

The per-path closed form: with parts = path.split(delimiter), the
token set is the non-empty ``delimiter.join(parts[:k])`` prefixes —
which makes the whole tokenizer ONE Spark column expression (split →
transform/array_join → filter), so hierarchy faceting over 10^12
paths stays a scan-side projection feeding an ordinary groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def path_tokens(
    path: str,
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
) -> list[str]:
    """Reference-faithful Python form (pinned on the complete
    TestPathHierarchyTokenizer vectors)."""
    if skip < 0:
        raise ValueError("skip cannot be negative")
    parts = path.split(delimiter)
    base = [
        delimiter.join(parts[:k])
        for k in range(1, len(parts) + 1)
    ]
    base = [t for t in base if t != ""]
    if skip:
        if len(base) <= skip:
            return []
        prefix = base[skip - 1]
        base = [t[len(prefix):] for t in base[skip:]]
    if replacement is not None and replacement != delimiter:
        base = [t.replace(delimiter, replacement) for t in base]
    return base


def path_hierarchy_col(
    col: Column,
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
) -> Column:
    """array<string> of hierarchy tokens as ONE column expression."""
    import re as _re

    parts = F.split(col, _re.escape(delimiter))
    toks = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size(parts)),
            lambda k: F.array_join(
                F.slice(parts, F.lit(1), k.cast("int")), delimiter
            ),
        ),
        lambda t: t != "",
    )
    if skip:
        prefix_len = F.length(F.element_at(toks, int(skip)))
        toks = F.when(F.size(toks) <= int(skip), F.array().cast(
            "array<string>"
        )).otherwise(
            F.transform(
                F.slice(toks, int(skip) + 1, F.size(toks)),
                lambda t: F.substring(
                    t, (prefix_len + 1).cast("int"), F.lit(2_147_483_647)
                ),
            )
        )
    if replacement is not None and replacement != delimiter:
        toks = F.transform(
            toks, lambda t: F.replace(t, F.lit(delimiter), F.lit(replacement))
        )
    return toks
