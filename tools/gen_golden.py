"""Generate golden test fixtures by running the REFERENCE decoder.

Usage: python tools/gen_golden.py [--oracle /tmp/refbuild/oracle_dump] files...

For each input audio file, decodes with the reference library (via the
oracle_dump tool built from tools/oracle_dump.cpp against the reference's
static lib) and stores a compact .npz in tests/golden/:
  channels, rate, count, sum64, head (first 8192 samples),
  stride997 (every 997th sample), maxabs.
Large files are thus summarized rather than stored in full; small files
(<= 2M samples) are stored in full under key `full`.
"""

from __future__ import annotations

import argparse
import pathlib
import struct
import subprocess
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden"


def read_oracle_raw(path: pathlib.Path):
    with open(path, "rb") as f:
        magic, ch, sr = struct.unpack("<III", f.read(12))
        (n,) = struct.unpack("<Q", f.read(8))
        assert magic == 0x524F514E
        samples = np.fromfile(f, dtype=np.float32, count=n)
    return ch, sr, samples


def summarize(name: str, ch: int, sr: int, samples: np.ndarray):
    out = {
        "channels": np.int64(ch),
        "rate": np.int64(sr),
        "count": np.int64(samples.size),
        "sum64": np.float64(samples.astype(np.float64).sum()),
        "maxabs": np.float64(np.abs(samples).max() if samples.size else 0.0),
        "head": samples[:8192].copy(),
        "stride997": samples[::997].copy(),
    }
    if samples.size <= 2_000_000:
        out["full"] = samples
    GOLDEN.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(GOLDEN / f"{name}.npz", **out)
    print(f"golden {name}: {ch}ch {sr}Hz {samples.size} samples")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--oracle", default="/tmp/refbuild/oracle_dump")
    ap.add_argument("files", nargs="+")
    args = ap.parse_args()

    for f in args.files:
        f = pathlib.Path(f)
        name = f.stem.replace(" ", "_")
        # Disambiguate the WAV matrix files (all named test.wav).
        if f.name == "test.wav":
            parts = f.parts
            name = "_".join(parts[-4:-1]) + "_test"
        with tempfile.NamedTemporaryFile(suffix=".raw") as tmp:
            r = subprocess.run(
                [args.oracle, str(f), tmp.name], capture_output=True
            )
            if r.returncode != 0:
                print(f"SKIP {f}: {r.stderr.decode().strip()}", file=sys.stderr)
                continue
            ch, sr, samples = read_oracle_raw(pathlib.Path(tmp.name))
        summarize(name, ch, sr, samples)


if __name__ == "__main__":
    main()
