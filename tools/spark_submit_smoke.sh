#!/usr/bin/env bash
# spark-submit --py-files smoke (north_rule compliance evidence).
# Zips the package, submits the flagship job from a NEUTRAL cwd with
# no repo on sys.path, and checks the output marker.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/osmnightwatch_spark.zip
rm -f "$ZIP"
(cd "$REPO" && python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("/tmp/osmnightwatch_spark.zip", "w") as z:
    for dirpath, _dirs, files in os.walk("osmnightwatch_spark"):
        for fn in files:
            if fn.endswith(".py"):
                z.write(os.path.join(dirpath, fn))
EOF
)
cd /tmp
/opt/spark/bin/spark-submit \
    --master "local[${SPARK_SUBMIT_CORES:-8}]" \
    --conf spark.sql.shuffle.partitions=16 \
    --py-files "$ZIP" \
    "$REPO/tools/submit_flagship.py" "${1:-3000}" 2>/dev/null \
  | grep FLAGSHIP_OK
