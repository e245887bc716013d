#!/bin/sh
# FASTA -> serialized index with locate support (reference scripts/fa_to_rowbowt.sh:
# pfbwt-f64 -s ... && rb_build -s).  Usage: fa_to_rowbowt.sh <in.fa> <out_prefix>
set -e
exec python -m rowbowt_tpu.cli.rbt_build --fasta "$1" -s -l -o "$2"
