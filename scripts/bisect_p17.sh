#!/bin/bash
# Isolated p17_mixture_order bench at a given commit: checkout into the
# shared bisect worktree, compile, run Bench ONLY=p17 REPS=5 at sf0.1.
# Usage: bisect_p17.sh <rev> [<rev2> ...]
set -u
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED \
--add-opens java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens java.base/java.io=ALL-UNNAMED \
--add-opens java.base/java.net=ALL-UNNAMED \
--add-opens java.base/java.nio=ALL-UNNAMED \
--add-opens java.base/java.util=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens java.base/sun.security.action=ALL-UNNAMED \
--add-opens java.base/sun.util.calendar=ALL-UNNAMED \
-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g"
WT=/root/repo/.worktrees/bisect
[ -d "$WT" ] || git -C /root/repo worktree add --detach "$WT" HEAD
for rev in "$@"; do
  git -C "$WT" checkout --detach -f "$rev" >/dev/null 2>&1
  (cd "$WT" && sbt -batch compile >/dev/null 2>&1) || { echo "COMPILE FAIL $rev"; continue; }
  SPARK_GRAFT_ONLY=p17 SPARK_GRAFT_REPS=5 \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/ab_r13/bisect_${rev}.json \
  java -cp "$WT/target/scala-2.13/classes:/opt/spark/jars/*" $JOPTS graft.Bench \
    > /root/repo/ab_r13/bisect_${rev}.log 2>&1
  python3 - "$rev" <<'EOF'
import json, sys
rev = sys.argv[1]
try:
    d = json.load(open(f"/root/repo/ab_r13/bisect_{rev}.json"))
    n = list(d["queries"])[0]
    print(f"BISECT {rev} median={d['queries'][n]} reps={d['reps_sec'][n]} calib={d['calibration_sec']}")
except Exception as e:
    print(f"BISECT {rev} FAILED: {e}")
EOF
done
echo BISECT_DONE
