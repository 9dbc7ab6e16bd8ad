"""Generate libnyquist_tpu/data/mp3_maps.npz — the MP3 synthesis linear maps.

Probes the minimp3-mirroring oracle (tests/mp3_ref.py) with unit impulses
to extract the exact linear maps the product decoder ships as data
(the same tables-as-data pattern as data/celt48k.tbl):

  * hybrid IMDCT per band kind k in {long/w0, long/w1, short}:
      out18 = A1_k @ x18 + B1_k @ ov9,   ov9' = A2_k @ x18
    (asserts the new overlap has no ov9 dependence, i.e. B2 == 0)
  * QMF polyphase: Q[i][j, b] = pcm sample j of slice s+i for a band-b
    impulse at slice s (16 maps; the FIR reach is 15 slices + current).

Run: python tools/gen_mp3_maps.py
"""

import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import mp3_ref  # noqa: E402  (the oracle mirror)


def probe_imdct():
    t = mp3_ref.T()
    w = t["g_mdct_window"]
    A1 = np.zeros((3, 18, 18), np.float32)
    B1 = np.zeros((3, 18, 9), np.float32)
    A2 = np.zeros((3, 9, 18), np.float32)

    def run(kind, x, ov):
        g = x.astype(np.float64).copy()
        o = ov.astype(np.float64).copy()
        if kind == 2:
            mp3_ref.imdct_short_vec(g, 0, o, 0, 1)
        else:
            mp3_ref.imdct36_vec(g, 0, o, 0, w[kind], 1)
        return g, o

    for kind in range(3):
        for j in range(18):
            e = np.zeros(18)
            e[j] = 1.0
            g, o = run(kind, e, np.zeros(9))
            A1[kind, :, j] = g
            A2[kind, :, j] = o
        for j in range(9):
            e = np.zeros(9)
            e[j] = 1.0
            g, o = run(kind, np.zeros(18), e)
            B1[kind, :, j] = g
            assert np.abs(o).max() == 0.0, (
                f"kind {kind}: new overlap depends on old overlap")
    return A1, B1, A2


def probe_qmf():
    """Q[i] [32,32]: pcm slice s+i from a band impulse at slice s."""
    Q = np.zeros((16, 32, 32), np.float32)
    for b in range(32):
        qmf = np.zeros(960, np.float32)
        g0 = np.zeros((2, 576), np.float32)
        g0[0, b * 18 + 0] = 1.0
        out0 = mp3_ref.synth_granule(qmf, g0.copy(), 18, 1)  # slices 0..17
        g1 = np.zeros((2, 576), np.float32)
        out1 = mp3_ref.synth_granule(qmf, g1, 18, 1)         # slices 18..35
        outs = np.concatenate([out0, out1], axis=0)[:, 0]
        for i in range(16):
            Q[i, :, b] = outs[i * 32: (i + 1) * 32]
        # reach must be exactly 16 slices
        assert np.abs(outs[16 * 32:]).max() == 0.0, "FIR reach > 16 slices"
    return Q


def main():
    A1, B1, A2 = probe_imdct()
    Q = probe_qmf()
    out = REPO / "libnyquist_tpu" / "data" / "mp3_maps.npz"
    with open(out, "wb") as f:
        np.savez_compressed(f, A1=A1, B1=B1, A2=A2, Q=Q)
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
