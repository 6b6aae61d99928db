from lucene_solr_spark.index.builder import (  # noqa: F401
    CollectionStats,
    IndexTables,
    assign_doc_ids,
    build_tables,
    invert,
)
from lucene_solr_spark.index.segments import (  # noqa: F401
    SegmentedIndex,
    SegmentInfo,
)
