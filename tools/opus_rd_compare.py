#!/usr/bin/env python3
"""Rate-distortion: our CELT encoder vs the reference's libopus.

Encodes the same 48 kHz signals at matched target bitrates with
(a) our encoder (formats/opus/celt_encoder.py, 20 ms frames,
constrained VBR) and (b) the reference build's libopus CELT path
(tools/opus_rd_ref.c against /tmp/refbuild/lib/liblibnyquist.a), and
prints achieved payload kbps + SNR for both.  Payload bytes count Opus
packets only (container overhead excluded on our side to match the
raw-packet reference probe).

Usage: python tools/opus_rd_compare.py
Needs /tmp/opus_rd_ref (build line in tools/opus_rd_ref.c).
"""

import pathlib
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import libnyquist_tpu as nq
from libnyquist_tpu.formats import ogg as oggmod
from libnyquist_tpu.formats.opus.celt_encoder import encode_ogg_opus

RD_REF = pathlib.Path("/tmp/opus_rd_ref")


def signals():
    sr = 48000
    t = np.arange(10 * sr) / sr
    yield ("sine-440 mono", 1,
           (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))
    l = 0.5 * np.sin(2 * np.pi * 440 * t)
    r = 0.4 * np.sin(2 * np.pi * 660 * t)
    yield ("sine-440/660 stereo", 2,
           np.stack([l, r], 1).reshape(-1).astype(np.float32))
    music = pathlib.Path("/root/reference/test_data/sb-reverie.opus")
    if music.exists():
        a = nq.load(str(music))
        s = np.asarray(a.samples, np.float32)[: 10 * sr * 2]
        yield ("sb-reverie 10s stereo", 2, s)


def ours(sig, ch, kbps):
    buf = encode_ogg_opus(sig, ch, 48000, bitrate_kbps=kbps, vbr=True,
                          frame_ms=20)
    payload = 0
    for st in oggmod.demux(buf).values():
        for p in st.packets:
            if not p.data.startswith((b"OpusHead", b"OpusTags")):
                payload += len(p.data)
    back = nq.load(buf, extension="opus")
    out = np.asarray(back.samples, np.float64)
    ref = np.asarray(sig, np.float64)
    m = min(out.size, ref.size)
    err = out[:m] - ref[:m]
    snr = 10 * np.log10(np.dot(ref[:m], ref[:m])
                        / max(np.dot(err, err), 1e-30))
    secs = sig.size / ch / 48000
    return payload * 8 / secs / 1000, snr


def theirs(sig, ch, kbps):
    with tempfile.NamedTemporaryFile(suffix=".f32") as f:
        np.asarray(sig, np.float32).tofile(f.name)
        out = subprocess.run(
            [str(RD_REF), f.name, str(ch), str(kbps * 1000), "200"],
            capture_output=True, text=True, timeout=300)
    if out.returncode != 0:
        raise RuntimeError(out.stderr)
    nbytes, snr = out.stdout.split()
    secs = sig.size / ch / 48000
    return int(nbytes) * 8 / secs / 1000, float(snr)


def main():
    if not RD_REF.exists():
        print("build /tmp/opus_rd_ref first (see tools/opus_rd_ref.c)")
        return 1
    import json

    rows = []
    print(f"{'signal':<24s} {'target':>7s} | {'ours kbps':>9s} "
          f"{'ours dB':>8s} | {'libopus kbps':>12s} {'libopus dB':>10s}")
    for name, ch, sig in signals():
        # stereo adds low-rate cells where the intensity decision
        # (celt_encoder.intensity_decision) carries the load
        for kbps in ((32, 48, 64, 96, 160) if ch == 2
                     else (64, 96, 160)):
            ok, osnr = ours(sig, ch, kbps)
            tk, tsnr = theirs(sig, ch, kbps)
            print(f"{name:<24s} {kbps:>5d}k | {ok:9.1f} {osnr:8.1f} | "
                  f"{tk:12.1f} {tsnr:10.1f}")
            rows.append({"signal": name, "channels": ch,
                         "target_kbps": kbps,
                         "ours_kbps": round(ok, 2),
                         "ours_snr_db": round(osnr, 2),
                         "libopus_kbps": round(tk, 2),
                         "libopus_snr_db": round(tsnr, 2)})
    # raw sweep artifact for the repo (VERDICT r3 weak #7: the
    # "ahead of libopus" claim should be checked-in evidence)
    out = pathlib.Path(__file__).parent / "rd_sweep_results.json"
    out.write_text(json.dumps({"sweep": rows}, indent=1) + "\n")
    print(f"# wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
