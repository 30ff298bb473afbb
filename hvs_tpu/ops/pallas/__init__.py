"""Pallas TPU kernels: fused Sinkhorn and fused mHC block."""

from .sinkhorn_pallas import sinkhorn_log_pallas
from .mhc_pallas import (
    apply_mhc_params_pallas,
    mhc_block_pallas,
    mhc_block_pallas_packed,
    mhc_pallas_min_tokens,
    mhc_pallas_packed_supported,
    mhc_pallas_supported,
)

__all__ = [
    "sinkhorn_log_pallas",
    "mhc_block_pallas",
    "mhc_block_pallas_packed",
    "mhc_pallas_min_tokens",
    "mhc_pallas_packed_supported",
    "mhc_pallas_supported",
    "apply_mhc_params_pallas",
]
