#!/usr/bin/env bash
# Package the library for spark-submit --py-files distribution.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/exaloglog_paper_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/exaloglog_paper_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("exaloglog_paper_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/exaloglog_paper_spark.zip")
EOF
