#!/usr/bin/env bash
# End-to-end via spark-submit --py-files (north-rule deployment surface).
# Usage: scripts/run_spark_submit.sh [corpus_parquet] [index_dir]
set -euo pipefail
cd "$(dirname "$0")/.."

CORPUS="${1:-/tmp/submit-demo/corpus}"
INDEX="${2:-/tmp/submit-demo/index}"
rm -rf "$INDEX"  # fresh build each demo run
MASTER="${MASTER:-local[8]}"

ZIP=/tmp/lucene_solr_spark.zip
rm -f "$ZIP"
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('lucene_solr_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
"

if [ ! -d "$CORPUS" ]; then
  python - <<EOF
import sys; sys.path.insert(0, '.')
from lucene_solr_spark.session import get_spark
from lucene_solr_spark.corpus import generate_corpus
from lucene_solr_spark.index import assign_doc_ids
spark = get_spark('gen', cores=8)
df = assign_doc_ids(generate_corpus(spark, 20000, partitions=16))
df.write.mode('overwrite').parquet('$CORPUS')
EOF
fi

spark-submit --master "$MASTER" --py-files "$ZIP" \
  scripts/submit_job.py build "$CORPUS" "$INDEX" 16
spark-submit --master "$MASTER" --py-files "$ZIP" \
  scripts/submit_job.py search "$INDEX" import return tokenize
