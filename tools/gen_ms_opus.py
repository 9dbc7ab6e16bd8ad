"""Build a synthetic 8-channel multistream Ogg Opus fixture.

The reference's Rachel8ch.opus blob is stripped from the repo and its
source material is online-only, so we exercise the same decode path
(channel mapping family 1, self-delimited packets, RFC 7845 demux) with
a synthetic file: 4 coupled stereo streams carrying the first seconds of
sb-reverie.opus. Golden via the reference oracle (/tmp/refbuild/
oracle_dump, opusfile-based, which handles multistream natively).

Usage: python tools/gen_ms_opus.py
"""

from __future__ import annotations

import pathlib
import struct
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from libnyquist_tpu.formats.ogg import demux, write_page  # noqa: E402

N_PACKETS = 150
SERIAL = 0x52414348


def self_delimit(pkt: bytes) -> bytes:
    """Code-0 packet -> RFC 6716 Appendix B self-delimited form."""
    assert (pkt[0] & 3) == 0, "generator only handles code-0 packets"
    frame = pkt[1:]
    n = len(frame)
    if n < 252:
        size = bytes([n])
    else:
        b1 = 252 + ((n - 252) % 4)
        size = bytes([b1, (n - b1) // 4])
    return bytes([pkt[0]]) + size + frame


def ogg_page(packet: bytes, granule: int, seq: int, bos=False, eos=False):
    return write_page(packet, granule, SERIAL, seq, bos=bos, eos=eos)


def main():
    data = (pathlib.Path("/root/reference/test_data/sb-reverie.opus")
            .read_bytes())
    stream = list(demux(data).values())[0]
    src = [p.data for p in stream.packets[2 : 2 + N_PACKETS]]
    head = stream.packets[0].data
    preskip = struct.unpack_from("<H", head, 10)[0]

    ms_head = (b"OpusHead" + bytes([1, 8]) + struct.pack("<HIh", preskip,
               48000, 0) + bytes([1, 4, 4]) + bytes(range(8)))
    tags = b"OpusTags" + struct.pack("<I", 12) + b"libnyquist_t" + \
        struct.pack("<I", 0)

    pages = [ogg_page(ms_head, 0, 0, bos=True), ogg_page(tags, 0, 1)]
    for i, pkt in enumerate(src):
        ms_pkt = self_delimit(pkt) * 3 + pkt
        pages.append(
            ogg_page(ms_pkt, 960 * (i + 1), 2 + i,
                     eos=(i == len(src) - 1))
        )
    out = REPO / "tests" / "fixtures" / "ms8ch.opus"
    out.write_bytes(b"".join(pages))
    print(f"wrote {out} ({out.stat().st_size} bytes)")

    raw = pathlib.Path("/tmp/ms8ch.raw")
    r = subprocess.run(["/tmp/refbuild/oracle_dump", str(out), str(raw)],
                       capture_output=True)
    print(r.stderr.decode().strip())
    with open(raw, "rb") as f:
        magic, ch, sr = struct.unpack("<III", f.read(12))
        (n,) = struct.unpack("<Q", f.read(8))
        samples = np.fromfile(f, np.float32, n)
    np.savez_compressed(
        REPO / "tests" / "golden" / "ms8ch.npz",
        channels=np.int64(ch), rate=np.int64(sr),
        count=np.int64(samples.size),
        sum64=np.float64(samples.astype(np.float64).sum()),
        maxabs=np.float64(np.abs(samples).max()),
        head=samples[:8192].copy(), stride997=samples[::997].copy(),
        full=samples,
    )
    print(f"golden: {ch}ch {sr}Hz {samples.size} samples")


if __name__ == "__main__":
    main()
