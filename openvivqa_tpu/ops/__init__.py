"""Pallas TPU kernels (fused attention family, decode-step megakernels,
one-hot gathers).

NOTE: no function re-exports here on purpose.  `from .fused_attention
import fused_attention` at package level would overwrite the submodule
attribute, making `import openvivqa_tpu.ops.fused_attention as fa` bind
the FUNCTION instead of the module — import from the submodules directly.
"""

from . import decode_step, fused_attention, gather  # noqa: F401
