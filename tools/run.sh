#!/bin/bash
# Direct JVM runner for compiled graft mains — avoids the sbt build lock
# (usage: tools/run.sh graft.Bench q_foo; env SPARK_GRAFT_* honored).
CLS=/root/repo/target/scala-2.13/classes
SCALA_LIB=$(ls ~/.cache/coursier/v1/https/*/org/scala-lang/scala-library/2.13.*/scala-library-2.13.*.jar 2>/dev/null | head -1)
# fallback search restricted to known cache/tool roots (a filesystem-wide
# find made every invocation crawl / when the coursier path missed)
[ -z "$SCALA_LIB" ] && SCALA_LIB=$(find ~/.cache ~/.sbt ~/.ivy2 /opt /usr/share 2>/dev/null -name 'scala-library-2.13*.jar' -not -path '*/spark/*' | head -1)
[ -z "$SCALA_LIB" ] && { echo "tools/run.sh: scala-library-2.13 jar not found in known roots" >&2; exit 1; }
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CLS:$SCALA_LIB:/opt/spark/jars/*" "$@"
