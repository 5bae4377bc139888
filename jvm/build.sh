#!/usr/bin/env bash
# Build the optional rptparquet DSv2 jar (runtime-filtered parquet scan).
# Requires only a JDK and the local Spark distribution's jars.
set -euo pipefail
cd "$(dirname "$0")"
SPARK_JARS="${SPARK_JARS:-/opt/spark/jars}"
CP=$(echo "$SPARK_JARS"/*.jar | tr ' ' ':')
rm -rf build && mkdir -p build
javac -encoding UTF-8 -cp "$CP" -d build src/rptspark/dsv2/*.java
mkdir -p build/META-INF/services
echo rptspark.dsv2.RptParquetProvider \
  > build/META-INF/services/org.apache.spark.sql.sources.DataSourceRegister
jar cf rpt-dsv2.jar -C build .
echo "built $(pwd)/rpt-dsv2.jar"
