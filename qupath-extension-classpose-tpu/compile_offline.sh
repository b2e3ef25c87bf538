#!/usr/bin/env bash
# Offline compile check for the QuPath extension.
#
# The full build is `gradle build` (needs network for qupath-gui-fx + gson).
# Where network is unavailable but a JDK (21+), a JavaFX SDK and a gson jar
# exist locally, this script type-checks every source against the vendored
# QuPath API stubs in stubs/:
#
#   JAVAFX_SDK=/path/to/javafx-sdk-21/lib GSON_JAR=/path/to/gson.jar ./compile_offline.sh
#
# Exit 0 == the extension compiles against the QuPath API surface it uses.
set -euo pipefail
cd "$(dirname "$0")"
: "${JAVAFX_SDK:?set JAVAFX_SDK to the JavaFX SDK lib directory}"
: "${GSON_JAR:?set GSON_JAR to a gson jar path}"
OUT=$(mktemp -d)
find src/main/java stubs -name '*.java' > "$OUT/sources.txt"
javac -d "$OUT/classes" \
    --module-path "$JAVAFX_SDK" \
    --add-modules javafx.controls,javafx.graphics,javafx.base \
    -cp "$GSON_JAR" \
    @"$OUT/sources.txt"
echo "OK: compiled $(wc -l < "$OUT/sources.txt") sources"
