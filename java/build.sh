#!/bin/sh
# Rebuild the JVM Jaro-Winkler UDF jar shipped at
# addressparser_spark/jars/jw-udf.jar (the jar is committed so deployments
# without a JDK still get the fast path; rerun this after editing the .java).
set -e
cd "$(dirname "$0")"
SPARK_JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
rm -rf build
mkdir -p build ../addressparser_spark/jars
javac -encoding UTF-8 -cp "$SPARK_JARS/*" -d build JaroWinkler.java IntersectCount.java LevSim.java TextSim.java
jar cf ../addressparser_spark/jars/jw-udf.jar -C build .
echo "built ../addressparser_spark/jars/jw-udf.jar"
