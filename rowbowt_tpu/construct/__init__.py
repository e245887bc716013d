from rowbowt_tpu.construct.panel import Panel, build_panel, parse_fasta, parse_vcf
from rowbowt_tpu.construct.sa import suffix_array
from rowbowt_tpu.construct.build import build_index

__all__ = [
    "Panel",
    "build_panel",
    "parse_fasta",
    "parse_vcf",
    "suffix_array",
    "build_index",
]
