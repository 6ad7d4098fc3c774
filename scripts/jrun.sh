#!/bin/bash
# Run a graft main class directly with java (no sbt startup): faster
# iteration for profiling/plan-capture. Classpath must be exported first:
#   sbt -batch "export Runtime/fullClasspath" | grep '^/' | tail -1 > /tmp/cp.txt
# Usage: scripts/jrun.sh graft.tools.Explain /root/testdata/sf0.01 q1 q2 ...
set -e
CP=$(cat /tmp/cp.txt)
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-32g} -cp "$CP" "$@"
