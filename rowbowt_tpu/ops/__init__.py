"""Batched device ops (searchsorted/rank/LF/phi kernels).

Import the module, not the functions: `from rowbowt_tpu.ops import rank as R`
(keeps the `rank` submodule addressable despite its `rank()` function).
"""

from rowbowt_tpu.ops import rank  # noqa: F401
