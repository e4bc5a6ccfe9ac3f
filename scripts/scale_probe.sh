#!/usr/bin/env bash
# Re-execute the scale evidence end to end:
#   10x  — generate + full DuckDB-oracle compare (correctness at scale)
#   30x  — generate + bench sweep (wall curve)
#   100x — generate + bench sweep
# Every stage runs in the DEFAULT 8 GB heap since round 10 (the b7/b16
# distinct rewrite, file-backed stream sinks, AQE-decoupled shuffle
# width, and hash-argmax assignments removed every >8 GB consumer).
# The 30x oracle compare also passes, but the near-dup-family oracles
# need DuckDB babysitting — see "Scale probes" in
# .claude/skills/verify/SKILL.md (DUCK_MEM=110GB one query at a time,
# and scripts/check_d7_closure.py for d7's oracle).
# Usage: scripts/scale_probe.sh [src_sf_dir]   (default /root/testdata/sf0.1)
# Artifacts: scaledata/sf{1,3,10}-synth/, /tmp/scale_probe/, bench_out.json
# per sweep (copy it between runs — each sweep overwrites it).
set -euo pipefail
cd "$(dirname "$0")/.."
SRC="${1:-/root/testdata/sf0.1}"

sbt -batch "runMain graft.ScaleGen $SRC scaledata/sf1-synth 10"
sbt -batch "runMain graft.ScaleGen $SRC scaledata/sf3-synth 30"
sbt -batch "runMain graft.ScaleGen $SRC scaledata/sf10-synth 100"

sbt -batch "runMain graft.Verify scaledata/sf1-synth /tmp/scale_probe/v10x"
DUCK_MEM="${DUCK_MEM:-48GB}" python3 scripts/check.py /tmp/scale_probe/v10x scaledata/sf1-synth

SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf3-synth" SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" | tee /tmp/scale_probe/bench_30x.log
cp bench_out.json /tmp/scale_probe/bench_out_30x.json

SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf10-synth" SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" | tee /tmp/scale_probe/bench_100x.log
cp bench_out.json /tmp/scale_probe/bench_out_100x.json

echo "scale probe complete: 10x oracle-green, sweeps in /tmp/scale_probe/"
