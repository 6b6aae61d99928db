"""UpdateRequestProcessor chain (solr/update/processor/
FieldMutating* factories)."""

import pytest

from lucene_solr_spark.functions.urp import URPChain


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "  Hello World  ", ["b", "a", "b", "c", "a"]),
            (2, "foo-bar-baz", ["z"]),
            (3, "", []),
        ],
        "id long, s string, vals array<string>",
    )


def test_scalar_chain_composition(spark, docs):
    out = (
        URPChain()
        .clone_field("s", "s_raw")
        .trim("s")
        .regex_replace("s", "-", " ")
        .truncate("s", 9)
        .field_length("s", "s_len")
        .remove_blank("s")
        .apply(docs)
        .orderBy("id")
        .collect()
    )
    assert out[0]["s"] == "Hello Wor" and out[0]["s_raw"] == "  Hello World  "
    assert out[0]["s_len"] == 9
    assert out[1]["s"] == "foo bar b"
    assert out[2]["s"] is None  # blank removed AFTER length computed
    assert out[2]["s_len"] == 0


def test_regex_replacement_is_literal(spark):
    """literalReplacement=true default: '$1' in the replacement is the
    two characters, never a group ref."""
    df = spark.createDataFrame([("axb",)], "s string")
    got = (
        URPChain().regex_replace("s", "(x)", "$1!").apply(df).first()["s"]
    )
    assert got == "a$1!b"


def test_multivalue_processors(spark, docs):
    out = (
        URPChain()
        .clone_field("vals", "uniq")
        .uniq_values("uniq")
        .clone_field("vals", "n")
        .count_values("n")
        .clone_field("vals", "first")
        .first_value("first")
        .clone_field("vals", "last")
        .last_value("last")
        .clone_field("vals", "mn")
        .min_value("mn")
        .clone_field("vals", "mx")
        .max_value("mx")
        .concat("vals", "|")
        .apply(docs)
        .orderBy("id")
        .collect()
    )
    r = out[0]
    assert list(r["uniq"]) == ["b", "a", "c"]  # first-occurrence order
    assert r["n"] == 5 and r["first"] == "b" and r["last"] == "a"
    assert r["mn"] == "a" and r["mx"] == "c"
    assert r["vals"] == "b|a|b|c|a"
    assert out[2]["n"] == 0 and out[2]["first"] is None


def test_chain_is_one_projection(spark, docs):
    """Catalyst collapses the sequential withColumns into a single
    Project over the scan — the no-shuffle ingest-map shape."""
    out = (
        URPChain()
        .trim("s")
        .field_length("s", "s_len")
        .concat("vals")
        .apply(docs)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_html_strip_processor(spark):
    df = spark.createDataFrame(
        [("<p>Hello <b>world</b></p>",)], "s string"
    )
    got = URPChain().html_strip("s").apply(df).first()["s"]
    assert "Hello" in got and "world" in got
    assert "<" not in got


def test_uniq_values_random(spark):
    """Randomized first-occurrence dedup vs a Python LinkedHashSet."""
    import random

    rng = random.Random(3)
    rows = []
    for i in range(40):
        rows.append(
            (i, [rng.choice("abcde") for _ in range(rng.randint(0, 12))])
        )
    df = spark.createDataFrame(rows, "id long, vals array<string>")
    got = {
        r["id"]: list(r["vals"])
        for r in URPChain().uniq_values("vals").apply(df).collect()
    }
    for i, vals in rows:
        assert got[i] == list(dict.fromkeys(vals)), (i, vals)
