"""Pallas comb-filter kernel vs the lax.scan reference implementation.

Runs in Pallas interpreter mode on the CPU test mesh; on real TPU the
same kernel compiles via Mosaic (validated bit-exact there too).
"""

import numpy as np
import pytest


@pytest.mark.parametrize("B,nch", [(4, 140), (8, 257)])
def test_comb_pallas_matches_scan(B, nch):
    import jax.numpy as jnp

    from libnyquist_tpu.ops.comb import CHUNK, HIST, comb_filter_stream
    from libnyquist_tpu.ops.comb_pallas import comb_filter_stream_pallas

    rng = np.random.default_rng(B * 1000 + nch)
    S = nch * CHUNK
    args = [
        jnp.asarray(v)
        for v in (
            rng.standard_normal((B, S)).astype(np.float32) * 0.1,
            rng.standard_normal((B, HIST)).astype(np.float32) * 0.1,
            rng.integers(15, 1024, (B, nch)).astype(np.int32),
            rng.integers(15, 1024, (B, nch)).astype(np.int32),
            (rng.standard_normal((B, nch, 3)) * 0.2).astype(np.float32),
            (rng.standard_normal((B, nch, 3)) * 0.2).astype(np.float32),
            rng.uniform(0, 1, (B, nch, CHUNK)).astype(np.float32),
        )
    ]
    y_ref, h_ref = comb_filter_stream(*args)
    y_pl, h_pl = comb_filter_stream_pallas(*args, interpret=True)
    assert np.abs(np.array(y_ref) - np.array(y_pl)).max() < 1e-6
    assert np.abs(np.array(h_ref) - np.array(h_pl)).max() < 1e-6
