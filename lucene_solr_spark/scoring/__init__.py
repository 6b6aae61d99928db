from lucene_solr_spark.scoring.bm25 import (  # noqa: F401
    BM25,
    NORM_TABLE,
    byte315_to_float,
    encode_norm,
    float_to_byte315,
    idf,
)
