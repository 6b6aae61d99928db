"""Atomic updates + RealTimeGet — the update-log document surface.

Ref: solr/core/src/java/org/apache/solr/update/processor/
AtomicUpdateDocumentMerger.java (set/inc/add/remove command merge),
solr/core/src/java/org/apache/solr/handler/RealTimeGetComponent.java
(get-by-id = latest uncommitted view: update log first, index second).

Spark shape: the update log is a COMMAND frame
``(doc_id, version, field, op, value)`` — an append-only parquet/delta
tail in production — and the merged view is derived relationally:

* scalar ``set``/``inc``: per (doc, field) the final value is the
  LAST set (max version) plus the sum of the increments that arrived
  AFTER it — two partial-aggregating groupBys on the (small) log,
  then one join per field onto the base.  Never a per-doc loop; the
  log shuffles, the 10^12-doc base is only joined.
* multivalued ``set``/``add``/``remove``: the version-ordered command
  list folds over the base array with one higher-order ``aggregate``
  lambda — interpreted, but only over LOG rows (the set of touched
  docs), not the corpus.
* upserts: a ``set`` for an id absent from the base creates the doc
  (full-outer join), matching the update log serving NEW uncommitted
  docs to /get.

RealTimeGet is then just the merged view filtered to the requested
ids — an isin pushdown, no full materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scalar_field(
    base: DataFrame, cmds: DataFrame, field: str, id_col: str
) -> DataFrame:
    """(id, _new_<field>, _touched) for one scalar field from its
    set/inc commands."""
    dtype = dict(base.dtypes).get(field, "string")
    c = cmds.filter(F.col("field") == field)
    sets = (
        c.filter(F.col("op") == "set")
        .groupBy(id_col)
        .agg(
            F.max_by("value", "version").alias("_set_val"),
            F.max("version").alias("_set_v"),
        )
    )
    incs = (
        c.filter(F.col("op") == "inc")
        .join(sets.select(id_col, "_set_v"), id_col, "left")
        .filter(F.col("version") > F.coalesce(F.col("_set_v"), F.lit(-1)))
        .groupBy(id_col)
        .agg(F.sum(F.col("value").cast("double")).alias("_inc"))
    )
    out = sets.join(incs, id_col, "full_outer")
    new_val = F.when(
        F.col("_set_val").isNotNull(),
        F.col("_set_val").cast(dtype) + F.coalesce("_inc", F.lit(0)).cast(dtype)
        if dtype in ("bigint", "int", "double", "float", "smallint")
        else F.col("_set_val").cast(dtype),
    )
    return out.select(
        id_col,
        new_val.alias(f"_new_{field}"),
        F.col("_inc").alias(f"_inc_{field}"),
    )


def _array_field(
    base: DataFrame, cmds: DataFrame, field: str, id_col: str
) -> DataFrame:
    """(id, _cmds_<field>) — the version-ordered command list for one
    multivalued field; the fold happens at merge time."""
    c = cmds.filter(F.col("field") == field)
    return c.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("version", "op", "value"))
        ).alias(f"_cmds_{field}")
    )


def apply_atomic_updates(
    base: DataFrame,
    commands: DataFrame,
    fields: dict[str, str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Merged latest view of ``base`` under the update-log
    ``commands`` (doc_id, version, field, op, value-as-string).
    ``fields`` maps each updatable field to 'scalar' or 'array'.
    Ids present only in the log become new docs (upsert)."""
    merged = base
    log_ids = commands.select(id_col).distinct()
    # upsert rows: ids in the log but not the base
    new_ids = log_ids.join(base.select(id_col), id_col, "left_anti")
    if fields:
        merged = merged.unionByName(
            new_ids.select(
                id_col,
                *[
                    F.lit(None).cast(t).alias(c)
                    for c, t in base.dtypes
                    if c != id_col
                ],
            ),
            allowMissingColumns=False,
        )
    for field, kind in fields.items():
        if kind == "scalar":
            side = _scalar_field(base, commands, field, id_col)
            merged = merged.join(side, id_col, "left")
            dtype = dict(base.dtypes).get(field, "string")
            merged = merged.withColumn(
                field,
                F.when(
                    F.col(f"_new_{field}").isNotNull(), F.col(f"_new_{field}")
                )
                .when(
                    F.col(f"_inc_{field}").isNotNull(),
                    (
                        F.coalesce(F.col(field).cast("double"), F.lit(0.0))
                        + F.col(f"_inc_{field}")
                    ).cast(dtype),
                )
                .otherwise(F.col(field)),
            ).drop(f"_new_{field}", f"_inc_{field}")
        elif kind == "array":
            side = _array_field(base, commands, field, id_col)
            merged = merged.join(side, id_col, "left")
            elem = dict(base.dtypes).get(field, "array<string>")
            elem = elem[len("array<"):-1] if elem.startswith("array<") else "string"
            cmds_col = f"_cmds_{field}"
            folded = F.aggregate(
                F.col(cmds_col),
                F.coalesce(
                    F.col(field), F.array().cast(f"array<{elem}>")
                ),
                lambda acc, x: (
                    F.when(
                        x["op"] == "set",
                        F.array(x["value"].cast(elem)),
                    )
                    .when(
                        x["op"] == "add",
                        F.concat(acc, F.array(x["value"].cast(elem))),
                    )
                    .when(
                        x["op"] == "remove",
                        F.array_remove(acc, x["value"].cast(elem)),
                    )
                    .otherwise(acc)
                ),
            )
            merged = merged.withColumn(
                field,
                F.when(F.col(cmds_col).isNotNull(), folded).otherwise(
                    F.col(field)
                ),
            ).drop(cmds_col)
        else:
            raise ValueError(f"unknown field kind {kind!r} for {field!r}")
    return merged


def realtime_get(
    base: DataFrame,
    commands: DataFrame,
    ids: list,
    fields: dict[str, str],
    id_col: str = "doc_id",
) -> DataFrame:
    """RealTimeGetComponent: fetch ids at their LATEST (uncommitted)
    state.  The id filter lands on both the base scan (pushdown) and
    the log before the merge — the merged view is never materialized
    beyond the requested ids."""
    b = base.filter(F.col(id_col).isin(ids))
    c = commands.filter(F.col(id_col).isin(ids))
    return apply_atomic_updates(b, c, fields, id_col).orderBy(id_col)
