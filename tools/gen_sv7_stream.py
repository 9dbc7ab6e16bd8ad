"""Generate a synthetic Musepack SV7 stream + oracle golden.

No SV7 fixture ships with the reference (only SV8 .mpc files), so we
synthesize one: random-but-valid frames written as the exact dual of
mpc_decoder_read_bitstream_sv7, sized with the 20-bit frame headers the
demuxer verifies, byte-swapped into the SV7 on-disk word order, then
decoded with the libmpcdec oracle (/tmp/mpc_oracle) for the golden.

Usage: python tools/gen_sv7_stream.py
"""

from __future__ import annotations

import pathlib
import struct
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from libnyquist_tpu.formats import musepack as MPC  # noqa: E402

N_FRAMES = 40
MAX_BAND = 17


class BW:
    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def __len__(self):
        return len(self.bits)


def enc_map(rows):
    """decode rows (Code, Len, Value) -> {value: (codeword, len)}"""
    return {v: (c >> (16 - ln), ln) for c, ln, v in rows}


def gen(rng):
    T = MPC._T
    hdr_map = enc_map(T["Hdr7"])
    scfi_map = enc_map(T["SCFI7"])
    dscf_map = enc_map(T["DSCF7"])

    res = [np.zeros(32, int), np.zeros(32, int)]
    scf = [np.zeros((32, 3), int), np.zeros((32, 3), int)]
    ms = True

    frames_bits = []
    for _ in range(N_FRAMES):
        bw = BW()
        # --- band residues ---
        tgt = [np.zeros(32, int), np.zeros(32, int)]
        for ch in range(2):
            for n in range(MAX_BAND + 1):
                r = int(rng.choice(
                    [0, 0, 0, 1, 2, 3, 4, 5, 7, 9, 12, 15, -1],
                ))
                tgt[ch][n] = r
        for n in range(MAX_BAND + 1):
            for ch in range(2):
                if n == 0:
                    if tgt[ch][0] < 0:
                        tgt[ch][0] = 0
                    bw.put(tgt[ch][0], 4)
                else:
                    diff = int(tgt[ch][n] - tgt[ch][n - 1])
                    if diff in hdr_map and diff != 4:
                        c, ln = hdr_map[diff]
                        bw.put(c, ln)
                    elif 0 <= tgt[ch][n] <= 15:
                        c, ln = hdr_map[4]
                        bw.put(c, ln)
                        bw.put(int(tgt[ch][n]), 4)
                    else:
                        tgt[ch][n] = tgt[ch][n - 1]  # give up: repeat
                        c, ln = hdr_map[0]
                        bw.put(c, ln)
            if tgt[0][n] or tgt[1][n]:
                bw.put(int(rng.integers(0, 2)), 1)  # MS flag
        res[0][: MAX_BAND + 1] = tgt[0][: MAX_BAND + 1]
        res[1][: MAX_BAND + 1] = tgt[1][: MAX_BAND + 1]
        max_used = 0
        for n in range(MAX_BAND + 1):
            if res[0][n] or res[1][n]:
                max_used = n + 1

        # --- SCFI ---
        scfi = [np.zeros(32, int), np.zeros(32, int)]
        for n in range(max_used):
            for ch in range(2):
                if res[ch][n]:
                    scfi[ch][n] = int(rng.integers(0, 4))
                    c, ln = scfi_map[scfi[ch][n]]
                    bw.put(c, ln)

        # --- SCF / DSCF ---
        def put_dscf(prev, target):
            diff = int(target - prev)
            if diff in dscf_map and diff != 8:
                c, ln = dscf_map[diff]
                bw.put(c, ln)
                return target
            c, ln = dscf_map[8]
            bw.put(c, ln)
            bw.put(int(target), 6)
            return target

        for n in range(max_used):
            for ch in range(2):
                if not res[ch][n]:
                    continue
                s = scf[ch][n]
                t0, t1, t2 = (int(rng.integers(0, 64)) for _ in range(3))
                code = int(scfi[ch][n])
                if code == 1:
                    s[0] = put_dscf(s[2], t0)
                    s[1] = put_dscf(s[0], t1)
                    s[2] = s[1]
                elif code == 3:
                    s[0] = put_dscf(s[2], t0)
                    s[1] = s[0]
                    s[2] = s[1]
                elif code == 2:
                    s[0] = put_dscf(s[2], t0)
                    s[1] = s[0]
                    s[2] = put_dscf(s[1], t2)
                else:
                    s[0] = put_dscf(s[2], t0)
                    s[1] = put_dscf(s[0], t1)
                    s[2] = put_dscf(s[1], t2)

        # --- samples ---
        for n in range(max_used):
            for ch in range(2):
                r = int(res[ch][n])
                if r in (0, -1) or r < -1:
                    continue
                if r == 1:
                    sel = int(rng.integers(0, 2))
                    bw.put(sel, 1)
                    rows = T["Q7"][0][sel]
                    for _ in range(12):
                        c, ln, _v = rows[int(rng.integers(0, len(rows)))]
                        bw.put(c >> (16 - ln), ln)
                elif r == 2:
                    sel = int(rng.integers(0, 2))
                    bw.put(sel, 1)
                    rows = T["Q7"][1][sel]
                    for _ in range(18):
                        c, ln, _v = rows[int(rng.integers(0, len(rows)))]
                        bw.put(c >> (16 - ln), ln)
                elif r <= 7:
                    sel = int(rng.integers(0, 2))
                    bw.put(sel, 1)
                    rows = T["Q7"][r - 1][sel]
                    for _ in range(36):
                        c, ln, _v = rows[int(rng.integers(0, len(rows)))]
                        bw.put(c >> (16 - ln), ln)
                else:
                    nb = T["Res_bit"][r]
                    for _ in range(36):
                        bw.put(int(rng.integers(0, 1 << nb)), nb)
        frames_bits.append(bw)

    # --- assemble: header + [20-bit size + frame]* (+11-bit last field) ---
    out = BW()
    out.put(N_FRAMES, 32)
    out.put(0, 1)               # intensity stereo
    out.put(1, 1)               # ms
    out.put(MAX_BAND, 6)
    out.put(10, 4)              # profile
    out.put(0, 2)               # link
    out.put(0, 2)               # 44100
    for _ in range(5):
        out.put(0, 16)          # peaks/gains
    out.put(1, 1)               # true gapless
    out.put(0, 11)              # last frame samples (0 -> full)
    out.put(0, 1)               # fast seek
    out.put(0, 19)
    out.put(102, 8)             # encoder version
    for i, bw in enumerate(frames_bits):
        out.put(len(bw), 20)
        out.bits += bw.bits
        if i == N_FRAMES - 1:
            out.put(0, 11)      # last-frame sample count field
    bits = out.bits + [0] * ((-len(out.bits)) % 8)
    payload = np.packbits(np.array(bits, np.uint8)).tobytes()
    payload += b"\x00" * ((-len(payload)) % 4)
    swapped = np.frombuffer(payload, np.uint8).reshape(-1, 4)[:, ::-1]
    return b"MP+\x07" + swapped.tobytes()


def main():
    rng = np.random.default_rng(7)
    data = gen(rng)
    fixtures = REPO / "tests" / "fixtures"
    fixtures.mkdir(exist_ok=True)
    path = fixtures / "sv7_stereo.mpc"
    path.write_bytes(data)
    print(f"wrote {path} ({len(data)} bytes)")
    raw = pathlib.Path("/tmp/sv7.raw")
    r = subprocess.run(["/tmp/mpc_oracle", str(path), str(raw)],
                       capture_output=True)
    print(r.stderr.decode().strip())
    with open(raw, "rb") as f:
        magic, ch, sr = struct.unpack("<III", f.read(12))
        (n,) = struct.unpack("<Q", f.read(8))
        samples = np.fromfile(f, np.float32, n)
    np.savez_compressed(
        REPO / "tests" / "golden" / "mpc_sv7.npz",
        channels=np.int64(ch), rate=np.int64(sr),
        count=np.int64(samples.size),
        sum64=np.float64(samples.astype(np.float64).sum()),
        maxabs=np.float64(np.abs(samples).max() if samples.size else 0),
        head=samples[:8192].copy(), stride997=samples[::997].copy(),
        full=samples,
    )
    print(f"golden: {ch}ch {sr}Hz {samples.size} samples")


if __name__ == "__main__":
    main()
