#!/usr/bin/env bash
# Package the engine and run the linkage job via spark-submit --py-files.
# Usage: scripts/submit_linkage.sh [master] [n_synthetic] [workdir]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[4]}"
N="${2:-2000}"
WORK="${3:-/tmp/linkage_job}"

cd "$REPO"
rm -f /tmp/spacy_ann_linker_spark.zip
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('/tmp/spacy_ann_linker_spark.zip', 'w') as z:
    for root, _, files in os.walk('spacy_ann_linker_spark'):
        if '__pycache__' in root: continue
        for f in files:
            p = os.path.join(root, f)
            z.write(p, p)
"
exec spark-submit --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files /tmp/spacy_ann_linker_spark.zip \
  jobs/link_job.py --n-synthetic "$N" \
  --output "$WORK/clusters" --checkpoint "$WORK/ckpt"
