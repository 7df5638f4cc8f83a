#!/usr/bin/env bash
# spark-submit launch path (north rule): package the library, ship it
# with --py-files, run the crawl driver. On a real cluster add
# --master/--num-executors; locally this demonstrates the identical
# submit contract.
#
# Usage: tools/submit.sh --catalog DIR --documents PARQUET -u URL [engine flags...]
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=$(mktemp -d)/scrapetition_spark.zip
(python -c "import zipfile, pathlib, sys
z = zipfile.ZipFile(sys.argv[1], 'w')
for p in pathlib.Path('scrapetition_spark').rglob('*.py'):
    z.write(p)
z.close()" "$ZIP")

# extra submit flags (e.g. --master, --num-executors) via
# SCRAPETITION_SUBMIT_FLAGS; NOT SPARK_SUBMIT_OPTS, which Spark
# itself treats as JVM options.
exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
    --py-files "$ZIP" \
    ${SCRAPETITION_SUBMIT_FLAGS:-} \
    scrapetition_spark/__main__.py "$@"
