#!/usr/bin/env bash
# Range + transitive queries over an alignment index.
set -euo pipefail
D=${1:-/tmp/impg_demo}
I="python -m impg_tpu.cli"

$I index -a "$D/pan.paf"                           # build + cache .impgt
$I stats -a "$D/pan.paf"
$I query -a "$D/pan.paf" -r ref:2000-8000 -d 100 -o bed
$I query -a "$D/pan.paf" -r ref:2000-8000 -d 100 -o paf | head -3
$I query -a "$D/pan.paf" -r ref:2000-8000 -d 100 -x -o bed     # transitive
$I query -a "$D/pan.paf" -b "$D/regions.bed" -d 100 -x -o bed  # batched BED
$I query -a "$D/pan.paf" -r ref:2000-8000 -d 100 -x --approximate -o bed
$I query -a "$D/pan.paf" -r ref:2000-8000 -d 100 -o fasta \
   --sequence-files "$D/pan.fa" | head -2
# Tracepoint containers: ASCII 1aln and binary TPA round-trip.
$I export-1aln -a "$D/pan.paf" -o "$D/pan.1aln"
$I export-tpa  -a "$D/pan.paf" -o "$D/pan.tpa"
$I query -a "$D/pan.tpa" -r ref:2000-8000 -d 100 -o bed | head -3
# Regional syng index from the query footprint.
$I query -a "$D/pan.paf" -r ref:2000-8000 -d 100 -o gbwt \
   --sequence-files "$D/pan.fa" -O "$D/region_syng"
echo OK
