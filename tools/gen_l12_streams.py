"""Generate synthetic MPEG Layer I/II test streams + goldens.

There are no L1/L2 fixtures in the reference test_data, so we synthesize
valid frames ourselves: random bit-allocation / scalefactors / samples
written with a budget tracker so frames never overrun, then decode with
the minimp3 oracle (built from the reference tree into /tmp/mp3_oracle)
to produce golden .npz fixtures. The streams land in tests/fixtures/.

Usage: python tools/gen_l12_streams.py
"""

from __future__ import annotations

import pathlib
import subprocess
import struct
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from libnyquist_tpu.formats import mp3 as M  # noqa: E402


class BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def tobytes(self, nbytes: int) -> bytes:
        bits = self.bits + [0] * (nbytes * 8 - len(self.bits))
        assert len(bits) <= nbytes * 8, "frame overrun"
        arr = np.array(bits[: nbytes * 8], np.uint8)
        return np.packbits(arr).tobytes()


def gen_frame(hdr: bytes, rng) -> bytes:
    alloc, total, stereo = M.l12_subband_alloc_table(hdr)
    layer1 = bool(M.hdr_is_layer_1(hdr))
    frame_bytes = M.hdr_frame_bytes(hdr, 0)
    budget = (frame_bytes - 4) * 8 - 64  # leave slack

    bw = BitWriter()
    spent = 0
    bitalloc = []
    ai, k, width, tab_off = 0, 0, 0, 0
    # sample-bit cost per band-channel for a chosen ba over the frame
    group = 1 if layer1 else 3
    ncodes = 3 * 4  # granule calls * j-groups

    def cost(ba):
        if ba == 0:
            return 0
        scf_bits = 2 + 18  # scfcod + up to 3 scf reads (upper bound)
        if layer1:
            scf_bits = 6
        if ba < 17:
            return scf_bits + ncodes * group * ba
        mod = (2 << (ba - 17)) + 1
        return scf_bits + ncodes * (mod + 2 - (mod >> 3))

    for i in range(total):
        if i == k:
            tab_off, width, cnt = alloc[ai]
            k += cnt
            ai += 1
        tab = M._BITALLOC_CODE_TAB[tab_off : tab_off + (1 << width)]
        for ch in range(2 if i < stereo else 1):
            idx = int(rng.integers(0, 1 << width))
            if rng.random() < 0.35:
                idx = 0
            ba = tab[idx]
            if spent + cost(ba) + width > budget:
                idx, ba = 0, 0
            bw.put(idx, width)
            spent += width + cost(ba)
            bitalloc.append(ba)
        if i >= stereo:
            bitalloc.append(0)

    # reorder bitalloc into [2*i], [2*i+1] layout used below
    ba_pairs = []
    bi = 0
    for i in range(total):
        if i < stereo:
            ba_pairs += [bitalloc[bi], bitalloc[bi + 1]]
            bi += 2
        else:
            ba_pairs += [bitalloc[bi], 0]
            bi += 2
    scfcod = []
    for i in range(2 * total):
        if ba_pairs[i]:
            if layer1:
                scfcod.append(2)
            else:
                c = int(rng.integers(0, 4))
                bw.put(c, 2)
                scfcod.append(c)
        else:
            scfcod.append(6)
    for i in range(2 * total):
        ba = ba_pairs[i]
        mask = (4 + ((19 >> scfcod[i]) & 3)) if ba else 0
        for m in (4, 2, 1):
            if mask & m:
                bw.put(int(rng.integers(0, 40)), 6)  # sane scf range
    # samples: 3 granule calls x 4 j-groups
    for _ in range(3):
        for _ in range(4):
            for i in range(2 * total):
                ba = ba_pairs[i]
                if not ba:
                    continue
                if ba < 17:
                    for _ in range(group):
                        bw.put(int(rng.integers(0, 1 << ba)), ba)
                else:
                    mod = (2 << (ba - 17)) + 1
                    nb = mod + 2 - (mod >> 3)
                    bw.put(int(rng.integers(0, mod ** group)), nb)
    return hdr + bw.tobytes(frame_bytes - 4)


def main():
    rng = np.random.default_rng(42)
    fixtures = REPO / "tests" / "fixtures"
    fixtures.mkdir(exist_ok=True)
    cases = {
        # (name, header): L2 stereo 44.1k 192k; L2 joint; L2 mono 56k
        # (low-rate alloc); L1 stereo 448k; MPEG2 L2 22.05k
        "l2_stereo_44k": bytes([0xFF, 0xFD, 0xA0, 0x00]),
        "l2_joint_44k": bytes([0xFF, 0xFD, 0xA0, 0x50]),
        "l2_mono_44k_56k": bytes([0xFF, 0xFD, 0x30, 0xC0]),
        "l1_stereo_44k": bytes([0xFF, 0xFF, 0xE0, 0x00]),
        "l2_mpeg2_22k": bytes([0xFF, 0xF5, 0xA0, 0x00]),
    }
    for name, hdr in cases.items():
        frames = b"".join(gen_frame(hdr, rng) for _ in range(12))
        path = fixtures / f"{name}.mp3"
        path.write_bytes(frames)
        raw = pathlib.Path(f"/tmp/{name}.raw")
        r = subprocess.run(["/tmp/mp3_oracle", str(path), str(raw)],
                           capture_output=True)
        print(name, r.stderr.decode().strip())
        with open(raw, "rb") as f:
            magic, ch, sr = struct.unpack("<III", f.read(12))
            (n,) = struct.unpack("<Q", f.read(8))
            samples = np.fromfile(f, np.float32, n)
        out = dict(
            channels=np.int64(ch), rate=np.int64(sr),
            count=np.int64(samples.size),
            sum64=np.float64(samples.astype(np.float64).sum()),
            maxabs=np.float64(np.abs(samples).max() if samples.size else 0),
            head=samples[:8192].copy(), stride997=samples[::997].copy(),
            full=samples,
        )
        np.savez_compressed(REPO / "tests" / "golden" / f"{name}.npz", **out)


if __name__ == "__main__":
    main()
