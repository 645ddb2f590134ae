#!/usr/bin/env bash
# Package the engine and run it via spark-submit --py-files — the deployment
# shape the north rule specifies. Locally this uses --master local[N]; on a
# cluster swap the master/executor flags.
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${SPARK_MASTER:-local[8]}"
ZIP=/tmp/search_engine_spark.zip

rm -f "$ZIP"
python - <<'PY'
import zipfile, pathlib
root = pathlib.Path("search_engine_spark")
with zipfile.ZipFile("/tmp/search_engine_spark.zip", "w") as z:
    for p in sorted(root.rglob("*")):
        if p.is_file() and "__pycache__" not in p.parts:
            z.write(p, p.as_posix())
print("packaged /tmp/search_engine_spark.zip")
PY

SPARK_SUBMIT="$(python -c 'import pyspark, pathlib; print(pathlib.Path(pyspark.__file__).parent / "bin" / "spark-submit")')"

"$SPARK_SUBMIT" \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  tools/submit_job.py "$@"
