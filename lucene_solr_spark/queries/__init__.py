from lucene_solr_spark.queries.query import (  # noqa: F401
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    SynonymQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    FuzzyQuery,
)
from lucene_solr_spark.queries.parser import parse_query  # noqa: F401
from lucene_solr_spark.queries.rewriter import rewrite  # noqa: F401
from lucene_solr_spark.queries.searcher import IndexSearcher  # noqa: F401
