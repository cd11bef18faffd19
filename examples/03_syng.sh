#!/usr/bin/env bash
# Alignment-free syncmer backend.
set -euo pipefail
D=${1:-/tmp/impg_demo}
I="python -m impg_tpu.cli"

$I syng -f "$D/pan.fa" -o "$D/pan"                 # .syngt index
$I query -a "$D/pan.syngt" -r ref:2000-8000 -d 100 -o bed
$I query -a "$D/pan.syngt" -r ref:2000-8000 -d 100 -x -o bed \
   --sequence-files "$D/pan.fa"                    # refined chained multihop
$I query -a "$D/pan.syngt" -r ref:2000-8000 -d 100 -o gfa \
   --sequence-files "$D/pan.fa" | head -3
$I syng2gfa -a "$D/pan.syngt" --sequence-files "$D/pan.fa" | head -3
$I syng2gfa -a "$D/pan.syngt" --sequence-files "$D/pan.fa" --mode raw | head -3
$I map -a "$D/pan.syngt" -q "$D/reads.fastq" -o gaf -O "$D/reads.gaf"
$I map -a "$D/pan.syngt" -q "$D/reads.fastq" -o paf | head -3
echo OK
