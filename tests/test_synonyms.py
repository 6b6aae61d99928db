"""Synonym + shingle filters: rule parsing, flattened-graph positions,
chain order (synonyms before stop), and shingle adjacency.

Refs: analysis/synonym/SynonymGraphFilter.java + FlattenGraphFilter.java,
analysis/shingle/ShingleFilter.java, solr SolrSynonymParser.java.
"""

import numpy as np
import pandas as pd

from lucene_solr_spark.analysis.synonyms import (
    parse_synonym_rules,
    shingle_analyze_batch_flat,
    synonym_analyze_batch_flat,
)


def _flat(triple):
    d, t, p = triple
    return list(zip(d.tolist(), t.tolist(), p.tolist()))


class TestParse:
    def test_equivalence_class(self):
        m = parse_synonym_rules(["big, large, huge"])
        assert m.single["big"] == ("large", "huge")
        assert m.single["large"] == ("big", "huge")
        assert m.single["huge"] == ("big", "large")

    def test_explicit_single(self):
        m = parse_synonym_rules(["colour => color", "# comment", ""])
        assert m.single_replace["colour"] == ("color",)
        assert "colour" not in m.single

    def test_explicit_multi_lhs(self):
        m = parse_synonym_rules(["machine learning => ml"])
        assert m.multi[("machine", "learning")] == (("ml",), False)

    def test_equivalence_multi_member(self):
        m = parse_synonym_rules(["ml, machine learning"])
        assert m.single["ml"] == ("machine", "learning")
        assert m.multi[("machine", "learning")] == (("ml",), True)


class TestApply:
    def test_single_equivalence_positions(self):
        m = parse_synonym_rules(["spark, flare"])
        got = _flat(
            synonym_analyze_batch_flat(
                pd.Series(["Spark fire"]), m, stopwords=frozenset()
            )
        )
        assert got == [(0, "spark", 0), (0, "flare", 0), (0, "fire", 1)] or got == [
            (0, "flare", 0),
            (0, "spark", 0),
            (0, "fire", 1),
        ]

    def test_explicit_replaces_original(self):
        m = parse_synonym_rules(["colour => color"])
        got = _flat(
            synonym_analyze_batch_flat(
                pd.Series(["colour match"]), m, stopwords=frozenset()
            )
        )
        assert (0, "color", 0) in got and (0, "colour", 0) not in got
        assert (0, "match", 1) in got

    def test_multi_lhs_replacement(self):
        m = parse_synonym_rules(["machine learning => ml"])
        got = _flat(
            synonym_analyze_batch_flat(
                pd.Series(["deep machine learning rocks"]), m,
                stopwords=frozenset(),
            )
        )
        assert got == [(0, "deep", 0), (0, "ml", 1), (0, "rocks", 3)]

    def test_multi_lhs_does_not_cross_docs(self):
        m = parse_synonym_rules(["machine learning => ml"])
        got = _flat(
            synonym_analyze_batch_flat(
                pd.Series(["deep machine", "learning rocks"]), m,
                stopwords=frozenset(),
            )
        )
        assert not any(t == "ml" for _, t, _p in got)

    def test_synonyms_run_before_stop_and_gaps_survive(self):
        # 'the' is a stopword; rule maps it to a surviving synonym —
        # synonym emitted (chain order), original dropped by stop,
        # and downstream positions keep their gap
        m = parse_synonym_rules(["the, thee"])
        got = _flat(synonym_analyze_batch_flat(pd.Series(["the spark"]), m))
        assert (0, "thee", 0) in got
        assert (0, "spark", 1) in got
        assert not any(t == "the" for _, t, _p in got)

    def test_rhs_longer_than_lhs_stacks_on_span(self):
        m = parse_synonym_rules(["ml, machine learning"])
        got = _flat(
            synonym_analyze_batch_flat(
                pd.Series(["ml rocks"]), m, stopwords=frozenset()
            )
        )
        # ml is a 1-token span: both RHS tokens flatten onto position 0
        assert (0, "ml", 0) in got
        assert (0, "machine", 0) in got
        assert (0, "learning", 0) in got
        assert (0, "rocks", 1) in got


class TestShingles:
    def test_bigrams_with_unigrams(self):
        got = _flat(shingle_analyze_batch_flat(pd.Series(["Quick brown fox"])))
        assert (0, "quick", 0) in got and (0, "fox", 2) in got
        assert (0, "quick brown", 0) in got
        assert (0, "brown fox", 1) in got

    def test_no_cross_doc_shingles(self):
        got = _flat(
            shingle_analyze_batch_flat(pd.Series(["alpha beta", "gamma delta"]))
        )
        shingles = [t for _, t, _p in got if " " in t]
        assert sorted(shingles) == ["alpha beta", "gamma delta"]

    def test_trigram_range(self):
        got = _flat(
            shingle_analyze_batch_flat(
                pd.Series(["a b c d"]), min_shingle=2, max_shingle=3,
                output_unigrams=False,
            )
        )
        terms = sorted(t for _, t, _p in got)
        assert terms == ["a b", "a b c", "b c", "b c d", "c d"]
