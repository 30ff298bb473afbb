"""Offline int8 calibration for the quantized serve path.

Mirrors the precomputed-constraints flow (hvs_tpu/models/constraints.py): a
pure function run once at load/export time produces a variables collection
('quant') that the serving model reads — no runtime calibration, no mutable
state under jit. See hvs_tpu/ops/quant.py for the quantization scheme and the
bandwidth-bound rationale (artifacts/ROOFLINE_r03.json).

Reference parity note: the reference only gestures at quantization through
TensorRT/torch2trt flags (src/inference/engine.py:162-193,
src/config/base_config.py PrecisionMode.INT8) — never implemented. This is
the real thing, TPU-native.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable

import jax

from ..ops.quant import (
    build_quant_collection,
    merge_max_stats,
    merge_percentile_stats,
)


def calibrate_quant_scales(
    model,
    variables: Dict[str, Any],
    image_batches: Iterable[jax.Array],
    task: str = "detection",
    margin: float = 1.0,
    percentile: float = 100.0,
) -> Dict[str, Any]:
    """Run the FLOAT model over calibration batches, collect activation
    ranges, and return the 'quant' variables collection.

    Args:
        model: the (float) model whose quantized twin will serve; its
            ``act_quant``/``quant_calib`` fields are overridden here.
        variables: the float variables ({'params', ...}) to calibrate with —
            use the exact tree that will serve (e.g. EMA params +
            precomputed constraints).
        image_batches: iterable of [B, H, W, 3] normalized image batches.
            A handful of representative batches suffices for per-tensor
            max-abs calibration.
        margin: multiplier on the calibrated max (e.g. 1.0 = exact max).

    Returns:
        The 'quant' collection: ``model.clone(act_quant=True).apply(
        {**variables, 'quant': scales}, ...)`` serves int8.
    """
    calib_model = model.clone(
        act_quant=False, act_quant_fpn=False, act_quant_mhc=False,
        act_quant_vit=False,
        quant_calib=True,
    )
    # Drop any 'quant' collection riding along (e.g. identity scales from an
    # act_quant model's init): the float calib model must not require it.
    float_vars = {k: v for k, v in variables.items() if k != "quant"}

    @jax.jit
    def collect(vs, images):
        # variables enter as an ARGUMENT — closing over them would bake the
        # full param tree into the XLA program as constants (slow compile,
        # duplicated memory, recompile per checkpoint).
        _, mutated = calib_model.apply(
            vs, images, task=task, mutable=["quant_stats"]
        )
        return mutated["quant_stats"]

    stats = [jax.device_get(collect(float_vars, images)) for images in image_batches]
    if not stats:
        raise ValueError("calibration requires at least one image batch")
    merged = (
        merge_max_stats(stats)
        if percentile >= 100.0
        else merge_percentile_stats(stats, percentile)
    )
    return build_quant_collection(merged, margin=margin)
