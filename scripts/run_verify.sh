#!/bin/bash
# Local dev loop: Verify dump + DuckDB check for the named queries.
# Usage: scripts/run_verify.sh <sfDir> <outDir> [names...]
set -e
cd "$(dirname "$0")/.."
# Regenerate the runtime classpath locally (never committed — the
# compiled classes dir plus every Spark jar). Kept in an untracked
# cache file only to skip the ls on repeat runs.
if [ ! -f .cp ] || [ ! -s .cp ]; then
  {
    printf '%s' "$PWD/target/scala-2.13/classes"
    for j in /opt/spark/jars/*.jar; do printf ':%s' "$j"; done
  } > .cp
fi
CP=$(cat .cp)
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
java $OPENS -Xmx8g -cp "$CP" graft.Verify "$@" 2>&1 | grep -v "^\[" | tail -5
python3 scripts/check.py "$1" "$2" "${@:3}"
