#!/usr/bin/env bash
# Region variation graphs and graph operations.
set -euo pipefail
D=${1:-/tmp/impg_demo}
I="python -m impg_tpu.cli"

$I query -a "$D/pan.paf" -r ref:2000-8000 -d 100 -o gfa \
   --sequence-files "$D/pan.fa" > "$D/region.gfa"
$I query -a "$D/pan.paf" -r ref:2000-8000 -d 100 -o gfa \
   --gfa-engine seqwish --sequence-files "$D/pan.fa" > "$D/region_sw.gfa"
$I query -a "$D/pan.paf" -r ref:2000-8000 -d 100 \
   -o "gfa:sgd:smooth,block-len=900" --sequence-files "$D/pan.fa" | head -3
$I graph-report "$D/region.gfa" --flubbles | head -20
$I sort "$D/region.gfa" | head -3
$I smooth "$D/region_sw.gfa" -G 700,1100 --max-node-length 100 | head -3
$I crush "$D/region_sw.gfa" | head -3
$I normalize "$D/region_sw.gfa" | head -3
$I normalize-self-loops "$D/region_sw.gfa" --diagnose
$I gfa2vcf "$D/region.gfa" --reference ref | head -8
$I gfa2vcf "$D/region.gfa" --reference ref --sites flubbles | head -8
$I partition -a "$D/pan.paf" -w 10k -d 100 -o bed | head -5
echo OK
