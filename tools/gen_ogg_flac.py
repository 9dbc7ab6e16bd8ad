#!/usr/bin/env python3
"""Generate an Ogg FLAC fixture from a native .flac file.

Muxes per the FLAC-to-Ogg mapping (reference:
third_party/FLAC/src/ogg_mapping.c / ogg_encoder_aspect.c): first
packet = 0x7F 'FLAC' 1 0 nheaders(be16) 'fLaC' STREAMINFO; one packet
per remaining metadata block; then one packet per audio frame with
granulepos = cumulative sample count.  Frame boundaries come from a
decode pass with our own (bit-exact-verified) frame parser.

Usage: python tools/gen_ogg_flac.py IN.flac OUT.oga
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from libnyquist_tpu.formats import flac as F  # noqa: E402
from libnyquist_tpu.formats import ogg  # noqa: E402


def split_flac(data: bytes):
    """Return (metadata_blocks, [(frame_bytes, nsamples)])."""
    assert data.startswith(b"fLaC")
    pos = 4
    blocks = []
    stream_bps = 16
    stream_rate = 0
    while pos + 4 <= len(data):
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        blocks.append(data[pos : pos + 4 + length])
        if (hdr & 0x7F) == 0:
            body = data[pos + 4 : pos + 4 + length]
            stream_rate = int.from_bytes(body[10:13], "big") >> 4
            stream_bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
        pos += 4 + length
        if hdr & 0x80:
            break

    frames = []
    n = len(data)
    while pos + 4 < n:
        if not (data[pos] == 0xFF and (data[pos + 1] & 0xFC) == 0xF8):
            pos += 1
            continue
        start = pos
        br = F.BitReader(data, pos * 8)
        br.read(16)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        F._read_utf8_coded(br)
        blocksize = F._BLOCKSIZE_TAB[bs_code]
        if blocksize == -1:
            blocksize = br.read(8) + 1
        elif blocksize == -2:
            blocksize = br.read(16) + 1
        rate = F._RATE_TAB[sr_code]
        if rate == -1:
            br.read(8)
        elif rate in (-2, -3):
            br.read(16)
        bps = F._BPS_TAB[bps_code] or stream_bps
        br.read(8)
        if ch_code < 8:
            channels, assign = ch_code + 1, "indep"
        elif ch_code == 8:
            channels, assign = 2, "left_side"
        elif ch_code == 9:
            channels, assign = 2, "right_side"
        else:
            channels, assign = 2, "mid_side"
        for c in range(channels):
            ebps = bps
            if (assign == "left_side" and c == 1) or \
               (assign == "right_side" and c == 0) or \
               (assign == "mid_side" and c == 1):
                ebps += 1
            F._decode_subframe(br, blocksize, ebps)
        br.align()
        br.read(16)
        pos = (br.pos + 7) // 8
        frames.append((data[start:pos], blocksize))
    return blocks, frames


def mux(data: bytes, serial: int = 7) -> bytes:
    blocks, frames = split_flac(data)
    streaminfo, rest = blocks[0], blocks[1:]
    first = (b"\x7fFLAC" + bytes([1, 0])
             + len(rest).to_bytes(2, "big") + b"fLaC" + streaminfo)
    pages = [ogg.write_page(first, 0, serial, 0, bos=True)]
    seq = 1
    for b in rest:
        pages.append(ogg.write_page(b, 0, serial, seq))
        seq += 1
    g = 0
    for i, (fb, ns) in enumerate(frames):
        g += ns
        pages.append(ogg.write_page(fb, g, serial, seq,
                                    eos=(i == len(frames) - 1)))
        seq += 1
    return b"".join(pages)


if __name__ == "__main__":
    src = pathlib.Path(sys.argv[1]).read_bytes()
    out = mux(src)
    pathlib.Path(sys.argv[2]).write_bytes(out)
    print(f"{sys.argv[2]}: {len(out)} bytes")
