#!/usr/bin/env bash
# Package baram_spark for spark-submit --py-files deployment.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/baram_spark.zip
mkdir -p dist
python - <<'PY'
import os, zipfile
with zipfile.ZipFile("dist/baram_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("baram_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/baram_spark.zip written")
PY
