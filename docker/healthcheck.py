#!/usr/bin/env python
"""Container health probe (reference: docker/healthcheck.py — the CUDA tensor
test becomes a tiny jitted TPU computation + memory check)."""

import sys


def main() -> int:
    try:
        import jax
        import jax.numpy as jnp

        r = jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64)))
        assert float(r) == 64.0 * 64.0
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit and stats.get("bytes_in_use", 0) / limit > 0.98:
            print("device memory nearly exhausted")
            return 1
        print("ok:", jax.devices()[0])
        return 0
    except Exception as e:  # noqa: BLE001 — any failure is unhealthy
        print("unhealthy:", e)
        return 1


if __name__ == "__main__":
    sys.exit(main())
