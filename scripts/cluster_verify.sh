#!/usr/bin/env bash
# Serialization-boundary certification (round-10 verdict ask #1): run
# the FULL verify surface under local-cluster[2,16,4096] — two separate
# executor JVMs, real task/broadcast/expression serialization, real
# off-driver state store instances — then gate the dumped results
# through the same DuckDB oracle as the driver's correctness check.
# Writes the certification record to CLUSTER.md.
#
# Usage: [SF=/root/testdata/sf0.01] [OUT=/tmp/graft_cluster_verify] \
#          scripts/cluster_verify.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${SF:-/root/testdata/sf0.01}"
OUT="${OUT:-/tmp/graft_cluster_verify}"

# the Spark launcher resolves the scala version from source-build dirs
# unless told; a dist layout needs the env pin
export SPARK_SCALA_VERSION=2.13
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"

sbt -batch "runMain graft.tools.ClusterVerify $SF $OUT" 2>&1 \
  | tee /tmp/cluster_verify_run.log | grep -E "CLUSTER|\[verify\]" || true
grep -q "CLUSTER VERIFY OK" /tmp/cluster_verify_run.log

python3 scripts/check_oracle.py "$SF" "$OUT" | tee /tmp/cluster_oracle.log
if grep -q FAIL /tmp/cluster_oracle.log; then
  echo "ORACLE FAILURES under local-cluster" >&2
  exit 1
fi
echo "local-cluster certification green: $(grep -c '^OK' /tmp/cluster_oracle.log) queries"

# executor-failure recovery: kill an executor mid-batch and mid-stream,
# require retried results identical (see CLUSTER.md)
sbt -batch "runMain graft.tools.ClusterChaos $SF" 2>&1 \
  | tee /tmp/cluster_chaos.log | grep CHAOS
grep -q "CLUSTER CHAOS OK" /tmp/cluster_chaos.log
