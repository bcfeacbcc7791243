#!/usr/bin/env bash
# Package the engine for cluster launch:
#   scripts/package.sh && spark-submit --py-files dist/geodiff_spark.zip \
#       geodiff_spark/cli.py diff s3://base s3://mod s3://out
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/geodiff_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path("geodiff_spark")
with zipfile.ZipFile("dist/geodiff_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob("*.py")):
        if "__pycache__" in p.parts:
            continue
        z.write(p, p.as_posix())
print("dist/geodiff_spark.zip written")
EOF
unzip -l dist/geodiff_spark.zip | tail -2
