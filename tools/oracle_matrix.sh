#!/usr/bin/env bash
# Full oracle gate across every data distribution (r17: eight) — the
# adversarial-validation matrix VERDICT r15 item 3 asked for. Each leg is
# a complete Verify dump + DuckDB replay (tools/check_oracle.py) over one
# generation of the sf0.01 table set:
#
#   driver     /root/testdata/sf0.01          (the driver's own data)
#   zipf       GRAFT_DOC_VOCAB=zipf           (realistic sparse vocabulary)
#   chain      GRAFT_CHAIN_DOCS=200           (200-hop near-dup chain)
#   zipfchain  both of the above
#   evskew     GRAFT_EVENT_SKEW=1             (hot user + boundary/tie probes)
#   vecdegen   GRAFT_VEC_DEGEN=1              (zero-norm/dup/clustered vectors)
#   staradv    GRAFT_STAR_ADVERSARIAL=1       (NULL keys + hot custkey + 1-row group)
#   omni       ALL FIVE modes composed        (zipf + chain + evskew + vecdegen + staradv)
#
# Regenerate a missing generation with e.g.:
#   GRAFT_EVENT_SKEW=1 sbt -batch "runMain graft.tools.DataGen 0.01 testdata_gen/evskew_sf0.01"
# (zipf/chain/zipfchain legs: GRAFT_DOC_VOCAB=zipf and/or GRAFT_CHAIN_DOCS=200.)
#
# Usage: tools/oracle_matrix.sh [out-prefix]   (default /tmp/oracle_matrix)
set -u
cd "$(dirname "$0")/.."
prefix="${1:-/tmp/oracle_matrix}"
declare -A dirs=(
  [driver]=/root/testdata/sf0.01
  [zipf]=testdata_gen/zipf_sf0.01
  [chain]=testdata_gen/chain_sf0.01
  [zipfchain]=testdata_gen/zipfchain_sf0.01
  [evskew]=testdata_gen/evskew_sf0.01
  [vecdegen]=testdata_gen/vecdegen_sf0.01
  [staradv]=testdata_gen/staradv_sf0.01
  [omni]=testdata_gen/omni_sf0.01
)
rc=0
for leg in driver zipf chain zipfchain evskew vecdegen staradv omni; do
  d=${dirs[$leg]}
  if [ ! -d "$d" ]; then
    echo "[matrix] $leg: $d MISSING — regenerate (header comment)"; rc=1; continue
  fi
  sbt -batch "runMain graft.Verify $d ${prefix}_$leg" >"${prefix}_$leg.verify.log" 2>&1
  python3 tools/check_oracle.py "$d" "${prefix}_$leg" >"${prefix}_$leg.gate.txt" 2>&1
  line=$(tail -1 "${prefix}_$leg.gate.txt")
  echo "[matrix] $leg: $line"
  echo "$line" | grep -q ", 0 fail" || rc=1
done
exit $rc
