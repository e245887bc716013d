"""rowbowt-tpu: TPU-native pangenome r-index query engine.

A brand-new jax/XLA/Pallas framework with the capabilities of the CPU reference
`alshai/rowbowt` (run-length BWT count / locate / marker-genotyping queries over a
pangenome index), re-designed TPU-first: all succinct-structure operations become
batched searchsorted+gather over dense sorted tables, and thousands of reads run
backward search in lockstep inside jit'd lax loops.

See DESIGN.md for the architecture and SURVEY.md for the reference analysis.
"""

from rowbowt_tpu.alphabet import Alphabet, TERM_BYTE, SEP_BYTE
from rowbowt_tpu.index import RbtIndex

__version__ = "0.1.0"

__all__ = [
    "Alphabet",
    "RbtIndex",
    "TERM_BYTE",
    "SEP_BYTE",
    "__version__",
]
