#!/bin/sh
# Rebuild mem-catalog.jar from source against the installed pyspark jars.
set -e
cd "$(dirname "$0")"
JARS="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
rm -rf classes && mkdir classes
find src -name "*.java" | xargs javac -encoding UTF-8 -cp "$JARS/*" -d classes
jar cf mem-catalog.jar -C classes .
rm -rf classes
echo "built mem-catalog.jar"
