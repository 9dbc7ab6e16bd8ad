"""`libnyquist-tpu` console entry point (pyproject [project.scripts]).

The packaged twin of examples/main.py — the reference's example app
surface (reference: examples/src/Main.cpp: load, print `len / sum`,
verify the Opus oracle checksums, optional save) plus the added SRC
and URL sources:

  libnyquist-tpu FILE_OR_URL [--save OUT.wav|OUT.opus] [--rate HZ]
                             [--check] [--info]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

ORACLE_PAIRS = {(403, 21_472_602), (40, 127_712_488), (719, 21_472_602)}


def main(argv=None) -> int:
    import libnyquist_tpu as nq
    from libnyquist_tpu.audio_data import PCMFormat
    from libnyquist_tpu.encoders import EncoderParams, encode_wav_to_disk

    ap = argparse.ArgumentParser(
        prog="libnyquist-tpu", description=__doc__)
    ap.add_argument("file", help="audio file path or http(s):// URL")
    ap.add_argument("--save", help="write decoded audio (.wav / .opus)")
    ap.add_argument("--rate", type=int,
                    help="resample to this rate before saving")
    ap.add_argument("--check", action="store_true",
                    help="verify the reference oracle checksums")
    ap.add_argument("--info", action="store_true",
                    help="print stream info only (lazy; no full decode)")
    args = ap.parse_args(argv)

    if args.info:
        src = (args.file if not args.file.startswith(("http://",
                                                      "https://"))
               else None)
        r = (nq.seek_reader(src) if src is not None
             else nq.open_url(args.file))
        print(f"{type(r).__name__}: {r.pcm_total()} samples/ch")
        return 0

    t0 = time.perf_counter()
    if args.file.startswith(("http://", "https://")):
        audio = nq.load_url(args.file)
    else:
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
            audio, "opusdec.wav")
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
