"""Pallas TPU kernels: fused Sinkhorn and fused mHC block."""

from .sinkhorn_pallas import sinkhorn_log_pallas
from .mhc_pallas import mhc_block_pallas, mhc_pallas_supported, apply_mhc_params_pallas

__all__ = ["sinkhorn_log_pallas", "mhc_block_pallas", "mhc_pallas_supported",
           "apply_mhc_params_pallas"]
