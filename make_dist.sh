#!/bin/sh
# Build the --py-files artifact for spark-submit deployment.
set -e
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/fundamental_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/fundamental_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("fundamental_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/fundamental_spark.zip written")
EOF
