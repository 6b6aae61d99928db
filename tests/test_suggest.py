

def test_blended_infix_positions_demote(spark):
    from lucene_solr_spark.queries.suggest import suggest_blended_infix

    sugg = spark.createDataFrame(
        [
            ("star wars", 100),
            ("the wars of stars", 100),  # 'wars' at analyzed pos 1
            ("empire strikes wars", 100),
            ("no match here", 500),
        ],
        "key string, weight long",
    )
    got = [
        (r["key"], r["score"])
        for r in suggest_blended_infix(sugg, "wars", n=5).collect()
    ]
    # positions: star wars→1, the wars…→1 (stop gap preserved),
    # empire strikes wars→2; linear coef 1−0.1·pos
    assert dict(got) == {
        "star wars": 90,
        "the wars of stars": 90,
        "empire strikes wars": 80,
    }
    assert got[0][1] == 90 and got[-1][1] == 80


def test_blended_infix_reciprocal_and_exponential(spark):
    from lucene_solr_spark.queries.suggest import suggest_blended_infix

    sugg = spark.createDataFrame(
        [("a b target", 100), ("target first", 100)],
        "key string, weight long",
    )
    rec = dict(
        (r["key"], r["score"])
        for r in suggest_blended_infix(
            sugg, "target", n=5, blender="reciprocal"
        ).collect()
    )
    assert rec == {"target first": 100, "a b target": 33}  # 100/(2+1)
    exp = dict(
        (r["key"], r["score"])
        for r in suggest_blended_infix(
            sugg, "target", n=5, blender="exponential_reciprocal", exponent=2.0
        ).collect()
    )
    assert exp == {"target first": 100, "a b target": 11}  # 100/9


def test_blended_infix_num_factor_pool(spark):
    """Blending only re-ranks inside the top n·numFactor raw-weight
    pool — a low-weight key with a perfect position can't enter."""
    from lucene_solr_spark.queries.suggest import suggest_blended_infix

    rows = [(f"filler match{i}", 1000 + i) for i in range(10)]
    rows.append(("match first", 10))  # best position, tiny weight
    sugg = spark.createDataFrame(rows, "key string, weight long")
    got = [
        r["key"]
        for r in suggest_blended_infix(
            sugg, "match", n=2, num_factor=5, key_col="key"
        ).collect()
    ]
    assert "match first" not in got  # outside the 10-candidate pool
