#!/usr/bin/env bash
# Compile the Catalyst extension (jvm/org/sqlrs/*.java) against the
# pyspark-bundled jars and package it at sqlrs_spark/jvm/sqlrs-extensions.jar.
# Idempotent: skips the rebuild when the jar is newer than every source.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
JARS_DIR="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
OUT_DIR="$REPO/sqlrs_spark/jvm"
JAR="$OUT_DIR/sqlrs-extensions.jar"

newer_than_sources() {
  [ -f "$JAR" ] || return 1
  for src in "$REPO"/jvm/org/sqlrs/*.java; do
    [ "$JAR" -nt "$src" ] || return 1
  done
}
if newer_than_sources; then
  echo "$JAR up to date"
  exit 0
fi

BUILD="$(mktemp -d)"
trap 'rm -rf "$BUILD"' EXIT
javac -encoding UTF-8 -proc:none -cp "$JARS_DIR/*" -d "$BUILD" "$REPO"/jvm/org/sqlrs/*.java
mkdir -p "$OUT_DIR"
jar cf "$JAR" -C "$BUILD" org
echo "built $JAR"
