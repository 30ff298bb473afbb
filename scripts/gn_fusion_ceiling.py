"""Measure the reclaimable HBM traffic in ConvMHCBlock's norm/SE/residual ops.

The serve program is HBM-bound (ROOFLINE_r04: util 0.88 @batch16) and the
backbone carries 55.9% of bytes (BYTES_r04). Within a block, the convs and the
(already-Pallas) mHC are irreducible traffic; the GroupNorm/SiLU/SE/residual
glue between them is pure bandwidth that fused Pallas kernels could reclaim
(stats + normalize + pool + scale + add are 3-6 extra map passes under XLA,
1-2 under a fused kernel).

This microbench times the full backbone against an ablated variant with
``use_se=False`` and GroupNorm replaced by identity (monkeypatched) — the
delta bounds what norm/SE fusion can possibly win. Run on the idle chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, x, iters=30):
    r = fn(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import functools

    from hvs_tpu.models import backbone as bb
    from hvs_tpu.models import layers as ly
    from hvs_tpu.models import constraints as cons

    batch = 16
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 640, 640, 3), jnp.float32)

    results = {}
    for variant in ("full", "no_gn_se"):
        if variant == "no_gn_se":
            # Identity-normalize: keeps shapes/params identical in count terms
            # not required — this is a bandwidth ceiling probe, not a parity
            # test. GroupNorm -> identity, SE off.
            class _IdGN:
                def __init__(self, *a, **k):
                    pass

                def __call__(self, y):
                    return y

            orig_gn = ly.group_norm
            ly.group_norm = lambda *a, **k: (lambda y: y)
            bb.group_norm = ly.group_norm
            use_se = False
        else:
            use_se = True

        model = bb.HybridVisionBackbone(
            sk_iters=20, use_se=use_se,
            precomputed_constraints=True, use_pallas=True,
        )
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
        varbs = {
            "params": v["params"],
            "constraints": cons.compute_constraints(v["params"], sk_iters=20),
        }

        f = jax.jit(lambda im: model.apply(varbs, im))
        lowered = f.lower(x)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        ms = bench(f, x)
        results[variant] = {
            "ms_per_batch": round(ms, 3),
            "xla_bytes": ca.get("bytes accessed", float("nan")),
        }
        print(variant, results[variant], flush=True)

        if variant == "no_gn_se":
            ly.group_norm = orig_gn
            bb.group_norm = orig_gn

    full, abl = results["full"], results["no_gn_se"]
    out = {
        "batch": batch,
        "image_size": 640,
        "full": full,
        "no_gn_se": abl,
        "delta_ms": round(full["ms_per_batch"] - abl["ms_per_batch"], 3),
        "delta_bytes_frac": round(
            1 - abl["xla_bytes"] / full["xla_bytes"], 4
        ),
        "note": (
            "delta = upper bound on what fused GN/SE/residual Pallas kernels "
            "can reclaim from the backbone (55.9% of serve bytes)"
        ),
    }
    print(json.dumps(out))
    with open("artifacts/GN_FUSION_CEILING_r04.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
