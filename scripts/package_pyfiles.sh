#!/usr/bin/env bash
# Package the library for spark-submit --py-files (north_rule).
# Produces dist/extractthinker_spark.zip containing only the package
# (no tests, no caches) — pure-python + Arrow, nothing to install on
# executors.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/extractthinker_spark.zip
# -x excludes bytecode caches; the zip root holds the package dir so
# `import extractthinker_spark` works from the executor PYTHONPATH.
zip -qr dist/extractthinker_spark.zip extractthinker_spark -x '*__pycache__*'
unzip -l dist/extractthinker_spark.zip | tail -2
echo "OK: dist/extractthinker_spark.zip"
