"""Pallas TPU kernels for the hot compute path."""

from nerface_tpu.ops.pallas.fused_mlp import (
    fused_paper_mlp,
    fused_paper_mlp_available,
)

__all__ = ["fused_paper_mlp", "fused_paper_mlp_available"]
