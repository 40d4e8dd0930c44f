#!/bin/bash
# SURVEY §6 scaling-curve methodology, reproducible:
#  1. build the structure-preserving COPIES-x fixture of sf0.1;
#  2. time each heavy query isolated (fresh JVM, one warmup run that
#     stages the DumpCache artifacts, one measured run) at sf0.1 and at
#     the fixture.
# Usage: scripts/scale_bench.sh [outdir]       (default /tmp/graft_scale)
#        COPIES=100 scripts/scale_bench.sh     (second decade; restrict
#        QUERIES to the scale-safe set — the exact-Θ(n²) contract rows
#        grow 10,000x in compares at 100x)
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/graft_scale}
COPIES=${COPIES:-10}
if [ "$COPIES" = 10 ]; then FIX=/tmp/graft_sf1; else FIX=/tmp/graft_sf_${COPIES}x; fi
mkdir -p "$OUT"
sbt -batch "runMain graft.ScaleFixture /root/testdata/sf0.1 $FIX $COPIES"
for t in region nation customer supplier part orders lineitem; do
  ln -sf /root/testdata/sf0.1/$t.parquet $FIX/$t.parquet
done
# override with QUERIES=... (the COPIES=100 decade used:
#   "dedup_ngram_jaccard dedup_minhash dedup_simhash dedup_substring
#    text_bpe_train text_cms ann_ivf")
QUERIES="${QUERIES:-dedup_ngram_jaccard dedup_containment dedup_minhash dedup_simhash \
dedup_delta_lsh dedup_substring dedup_substring_delta text_bpe_train text_cms \
dedup_embed dedup_embed_lsh dedup_clusters embed_knn_graph \
ann_ivf ann_pq ann_ivfpq embed_pca q_stream_dgim_tumble q_stream_dgim_slide \
q_transitions q_stream_ann_probe q_stream_delta_lsh}"
for SF in /root/testdata/sf0.1 $FIX; do
  TAG=$(basename "$SF")
  : > "$OUT/$TAG.txt"
  for q in $QUERIES; do
    SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=$q \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' >/dev/null
    SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=$q \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
      | sed "s/^\[info\] /$q /" >> "$OUT/$TAG.txt"
    echo "done $TAG $q"
  done
done
echo "results in $OUT"
