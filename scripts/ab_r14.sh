#!/bin/bash
# Isolated A/B bench for the r13 unchanged-code regression cluster
# (VERDICT r13 "Next round" #1): t02_quality_score 2.09x, t01_lang_id
# 1.61x, t37_kn_trigram 1.49x, t36_content_extract 1.45x normalized vs
# r12-final on code neither round touched. Runs each query alone in a
# fresh JVM (no shared-JVM debt), REPS=5, at the r12-final commit
# (41b3ba5, worktree .worktrees/r12final) and at HEAD, back-to-back so
# host drift cannot masquerade as a code regression. Calibration in
# each run additionally normalizes residual drift.
set -u
OUT=/root/repo/ab_r14
mkdir -p "$OUT"
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
run() { # rev classes query
  local rev=$1 classes=$2 q=$3
  SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_REPS=5 \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_BENCH_OUT="$OUT/${rev}_${q}.json" \
  java -cp "$classes:/opt/spark/jars/*" $JOPTS graft.Bench \
    > "$OUT/${rev}_${q}.log" 2>&1
  echo "done $rev $q rc=$?"
}
for q in t02 t01 t37 t36; do
  run r12 /root/repo/.worktrees/r12final/target/scala-2.13/classes "$q"
  run head /root/repo/target/scala-2.13/classes "$q"
done
echo AB_DONE
