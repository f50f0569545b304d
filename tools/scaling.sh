#!/bin/bash
# Scaling-efficiency evidence (BASELINE.md row 12): the same KG job at
# local[2] and local[8] (the linear region of this single-socket box; see
# BENCH.md), each level in its own JVM, eff = tpB/(4*tpA).
set -e
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}"
export SPARK_GRAFT_KG_DOCS="${SPARK_GRAFT_KG_DOCS:-800000}"
CPUS_A="${CPUS_A:-2}"
CPUS_B="${CPUS_B:-8}"
r8=$(sbt -batch "runMain graft.Scaling $CPUS_A" 2>/dev/null | grep -o '{"n_docs".*}')
r32=$(sbt -batch "runMain graft.Scaling $CPUS_B" 2>/dev/null | grep -o '{"n_docs".*}')
python3 - "$r8" "$r32" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
assert a["triples"] == b["triples"], "parallelism changed the result"
eff = b["docs_per_sec"] / (4 * a["docs_per_sec"])
print(json.dumps({"n_docs": a["n_docs"],
                  f"docs_per_sec_{a['cpus']}": a["docs_per_sec"],
                  f"docs_per_sec_{b['cpus']}": b["docs_per_sec"],
                  "triples": a["triples"],
                  "scaling_efficiency": round(eff, 3), "target": 0.8}))
EOF
