#!/usr/bin/env bash
# Read mapping, genotyping, inference, bundles, archives.
set -euo pipefail
D=${1:-/tmp/impg_demo}
I="python -m impg_tpu.cli"

$I syng -f "$D/pan.fa" -o "$D/pan" 2>/dev/null || true
$I map -a "$D/pan.syngt" -q "$D/reads.fastq" -o pack -O "$D/sample.packt"
$I map -a "$D/pan.syngt" -q "$D/reads.fastq" -o proj -O "$D/sample.proj"
$I read-index -q "$D/reads.fastq" -O "$D/reads"
$I genotype cos -a "$D/pan.syngt" -p "$D/sample.packt" -r ref:2000-8000 | head -5
# Cohort: many packs against one candidate panel (panel scores each
# sample; on the device engine the panel uploads once — DiploidPanel).
$I genotype cos -a "$D/pan.syngt" -p "$D/sample.packt,$D/sample.packt" \
   -r ref:2000-8000 | head -3
$I infer -a "$D/pan.syngt" -p "$D/sample.packt" -r ref:0-30000 \
   --gaf "$D/sample.proj/sample.gaf" --read-link-weight 0.5 | head -8
$I render -a "$D/pan.paf" -r ref:2000-8000 -d 100 \
   --sequence-files "$D/pan.fa" -O "$D/bundle" -x
ls "$D/bundle"
$I agz create "$D/pan.fa" -o "$D/pan.agz"
$I agz list "$D/pan.agz" | head -3
echo OK
