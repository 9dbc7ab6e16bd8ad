#!/usr/bin/env python3
"""Example CLI: load -> checksum -> optional save / resample.

Mirrors the reference example app (reference: examples/src/Main.cpp —
loads a file, prints `len / sum`, verifies the known Opus oracle
checksums, saves a WAV on mismatch). Also exposes the added SRC:

  python examples/main.py FILE [--save OUT.wav] [--rate HZ] [--check]

With --check, exits nonzero unless (int(sum), len) matches one of the
reference oracle pairs (Main.cpp:146-148).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import libnyquist_tpu as nq  # noqa: E402
from libnyquist_tpu.audio_data import PCMFormat
from libnyquist_tpu.encoders import EncoderParams, encode_wav_to_disk

ORACLE_PAIRS = {(403, 21_472_602), (40, 127_712_488), (719, 21_472_602)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("file", nargs="?",
                    default="test_data/sb-reverie.opus")
    ap.add_argument("--save", help="write decoded audio to a WAV file")
    ap.add_argument("--rate", type=int,
                    help="resample to this rate before saving")
    ap.add_argument("--check", action="store_true",
                    help="verify the reference oracle checksums")
    args = ap.parse_args(argv)

    t0 = time.perf_counter()
    audio = nq.load(args.file)
    dt = time.perf_counter() - t0
    total = float(np.asarray(audio.samples, np.float64).sum())
    print(f"len: {audio.sample_count} sum: {total:f}")
    print(f"[{dt*1e3:.1f} ms] {audio.channel_count}ch "
          f"{audio.sample_rate}Hz {audio.length_seconds:.2f}s")

    if args.rate and args.rate != audio.sample_rate:
        ch = audio.channel_count
        per = np.asarray(audio.samples).reshape(-1, ch).T
        res = np.asarray(nq.resample(per, audio.sample_rate, args.rate))
        audio.samples = res.T.reshape(-1).astype(np.float32)
        audio.sample_rate = args.rate
        print(f"resampled -> {args.rate}Hz, {audio.sample_count} samples")

    if args.check and (int(total), audio.sample_count) not in ORACLE_PAIRS:
        print("wrong results!  save to wave file")
        encode_wav_to_disk(
            EncoderParams(audio.channel_count, PCMFormat.PCM_FLT),
            audio, "opusdec.wav",
        )
        return 1

    if args.save:
        params = EncoderParams(audio.channel_count, PCMFormat.PCM_16)
        if args.save.lower().endswith(".opus"):
            from libnyquist_tpu.encoders import encode_opus_to_disk

            err = encode_opus_to_disk(params, audio, args.save)
        else:
            err = encode_wav_to_disk(params, audio, args.save)
        if err:
            print(f"save failed: {err}")
            return 1
        print(f"saved {args.save}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
