"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing — first-class at 100 TB scale."""

from lucene_solr_spark.functions.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
)
from lucene_solr_spark.functions.similarity import (  # noqa: F401
    cosine_topk,
    embedding_near_dups,
    lsh_ann_topk,
)
from lucene_solr_spark.functions.textstats import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score,
    token_counts,
)
