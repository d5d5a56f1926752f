#!/bin/sh
# Package the engine for `spark-submit --py-files` (north_rule launch path):
#   ./scripts/make_pyfiles.sh && \
#   spark-submit --py-files dist/tag_spark.zip run_validation.py --input ... --output ...
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/tag_spark.zip
python - <<'PY'
import os, zipfile
with zipfile.ZipFile("dist/tag_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("tag_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/tag_spark.zip")
PY
