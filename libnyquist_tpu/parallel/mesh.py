"""Device-mesh helpers for multi-chip decode scaling.

The decode pipeline scales over a (dp, sp, tp) `jax.sharding.Mesh`:
  dp — data parallel over concurrent streams (the serving axis),
  sp — sequence parallel over the frame/time axis, with `ppermute`
       halo exchanges for the state that crosses shard boundaries:
       TDAC overlap-add tails, comb-filter history (HIST samples),
       and the deemphasis carry (256 samples is exact in float32:
       0.85^256 ~ 1e-18),
  tp — tensor parallel over the IMDCT synthesis-matrix contraction,
       partial products combined with `psum` over ICI.

`__graft_entry__.dryrun_multichip` builds the full SPMD step with these
helpers; tests exercise it on a virtual CPU mesh.
"""

from __future__ import annotations

import numpy as np

# halo sizes that make sharded filters exact in float32
DEEMPH_HALO = 256          # 0.85^256 is far below float32 resolution


def factor_mesh(n_devices: int, serving: bool = False) -> tuple[int, int, int]:
    """Factor a device count into (dp, sp, tp).

    serving=True: pure data parallel (n, 1, 1) — concurrent decode
    streams are independent, so dp scales with ZERO collectives while
    every tp slice adds an all-reduce to a contraction that is already
    tiny per device (MESH_SCALING_r4.md: 0.27 GFLOP/device at tp=2) and
    every sp slice adds ppermute halo exchanges plus sp-1 serialized
    comb-refinement passes.  The measured dp-only row (tools/
    mesh_scaling.py --serving --dp-only) confirms: same per-device FLOP
    reduction, no collectives in the optimized HLO.  sp/tp exist for
    the latency-critical single-stream case (one long stream, many
    chips) — under-utilized chips trade efficiency for time-to-first-
    sample — and are exercised by the mixed validation mesh below.

    serving=False (default): the mixed (dp, sp, 2)-leaning factoring
    used by the multichip dryrun/tests so halo exchange, psum and the
    sp refinement chain all stay exercised.
    """
    if serving:
        return n_devices, 1, 1
    tp = 2 if n_devices % 2 == 0 else 1
    rem = n_devices // tp
    sp = 2 if rem % 2 == 0 else 1
    dp = rem // sp
    return dp, sp, tp


def make_mesh(n_devices: int | None = None):
    """Create a (dp, sp, tp) Mesh over the first n_devices devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = n_devices or len(devs)
    dp, sp, tp = factor_mesh(n)
    devices = np.array(devs[:n]).reshape(dp, sp, tp)
    return Mesh(devices, ("dp", "sp", "tp"))


def right_halo(x, axis_name: str):
    """Send each shard's tensor to its right neighbor along `axis_name`;
    the first shard receives zeros (stream start)."""
    import jax
    import jax.numpy as jnp

    n = jax.lax.axis_size(axis_name)
    if n == 1:  # singleton axis: the only shard is the stream start
        return jnp.zeros_like(x)
    perm = [(i, (i + 1) % n) for i in range(n)]
    received = jax.lax.ppermute(x, axis_name, perm)
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == 0, jnp.zeros_like(received), received)
