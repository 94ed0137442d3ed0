#!/usr/bin/env bash
# Package the engine and run the linkage job via spark-submit --py-files
# (the north rule's deployment mode). On a cluster, replace --master.
#
#   scripts/submit.sh [--master local[8]] [extra run.py args...]
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="local[*]"
if [[ "${1:-}" == "--master" ]]; then
  MASTER="$2"; shift 2
fi

PKG_ZIP="$(mktemp -d)/tfel_spark.zip"
# zip the package root so `import type_filtered_entity_linker_spark` works
python - "$PKG_ZIP" <<'EOF'
import sys, zipfile, pathlib
zpath = sys.argv[1]
root = pathlib.Path("type_filtered_entity_linker_spark")
with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
    for f in root.rglob("*.py"):
        z.write(f, f.as_posix())
EOF

# driver file may not live inside the zipped package: stage a shim
DRIVER="$(mktemp -d)/submit_linkage.py"
cat > "$DRIVER" <<'EOF'
import sys
from type_filtered_entity_linker_spark.run import main
sys.exit(main(sys.argv[1:]))
EOF

exec spark-submit \
  --master "$MASTER" \
  --driver-memory "${SPARK_DRIVER_MEM:-16g}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$PKG_ZIP" \
  "$DRIVER" "$@"
