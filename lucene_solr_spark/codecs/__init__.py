from lucene_solr_spark.codecs.forutil import for_decode, for_encode  # noqa: F401
from lucene_solr_spark.codecs.postings import (  # noqa: F401
    BLOCK_SIZE,
    decode_posting_block,
    encode_posting_blocks,
    encode_segment_blocks,
)
from lucene_solr_spark.codecs.vbyte import vbyte_decode, vbyte_encode  # noqa: F401
