"""TPU batched synthesis pipeline vs reference decode.

The pipeline (runtime/opus_pipeline.py) must produce the same PCM as
libopus for CELT streams: host entropy-decode to spectra, then batched
MXU IMDCT + comb scan + parallel deemphasis.
"""

import struct
import pathlib

import numpy as np
import pytest

from libnyquist_tpu.formats.opus import celt
from libnyquist_tpu.formats.opus.packet import parse_packet
from libnyquist_tpu.runtime import opus_pipeline

GOLDEN = pathlib.Path(__file__).parent / "golden" / "opus_packets.bin"


def read_case(idx):
    raw = GOLDEN.read_bytes()
    pos = 4
    for _ in range(idx):
        ch, sr, n_packets, frame = struct.unpack_from("<4i", raw, pos)
        pos += 16
        for _ in range(n_packets):
            (ln,) = struct.unpack_from("<i", raw, pos)
            pos += 4 + ln
        (ns,) = struct.unpack_from("<q", raw, pos)
        pos += 8 + 4 * ns
    ch, sr, n_packets, frame = struct.unpack_from("<4i", raw, pos)
    pos += 16
    pkts = []
    for _ in range(n_packets):
        (ln,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        pkts.append(raw[pos : pos + ln])
        pos += ln
    (ns,) = struct.unpack_from("<q", raw, pos)
    pos += 8
    pcm = np.frombuffer(raw, "<f4", ns, pos)
    return ch, frame, pkts, pcm


# Case 1 has transients (short blocks); case 0 steady; case 3 is 10 ms.
@pytest.mark.parametrize("idx", [0, 1, 3])
def test_tpu_pipeline_matches_reference(idx):
    if not GOLDEN.exists():
        pytest.skip("opus packet goldens not generated")
    ch, frame, pkts, ref = read_case(idx)
    st = celt.CeltDecoderState(channels=ch)
    infos = []
    for p in pkts[:40]:
        pkt = parse_packet(p)
        for fr in pkt.frames:
            infos.append(
                celt.celt_decode_frame_to_freq(st, fr, pkt.frame_size)
            )
    out = opus_pipeline.synthesize_stream(infos, ch)  # [S, ch]
    n = out.size
    err = np.abs(out.reshape(-1) - ref[:n]).max()
    assert err < 1e-4, f"pipeline err {err}"


def test_load_via_pipeline_matches_host(test_data_dir, monkeypatch):
    """Opt-in pipeline decode path (LIBNYQUIST_OPUS_PIPELINE=1) matches
    the per-frame host path on a real file."""
    import numpy as np

    import libnyquist_tpu as nq

    path = str(test_data_dir / "short.opus")
    a = nq.load(path)
    monkeypatch.setenv("LIBNYQUIST_OPUS_PIPELINE", "1")
    b = nq.load(path)
    assert a.sample_count == b.sample_count
    assert np.abs(a.samples - b.samples).max() < 1e-4
