#!/usr/bin/env python3
"""A/B benchmark: native C hot loops vs pure-Python fallbacks.

The analog of the reference's branch A/B benchmark
(reference: benchmark_constant.sh:1-58 — builds two branches, runs the
same workload, prints the speedup). Here the two "branches" are the
env-gated native/Python implementations of each codec's entropy plane;
both run in subprocesses on the same inputs and the speedup is printed
per codec.

Usage: python tools/bench_ab.py [--repeat N]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
DATA = pathlib.Path("/root/reference/test_data/ad_hoc")

CASES = [
    ("opus/celt", "LIBNYQUIST_NO_NATIVE_CELT",
     str(pathlib.Path("/root/reference/test_data/short.opus"))),
    ("mp3", "LIBNYQUIST_NO_NATIVE_MP3", str(DATA / "acetylene.mp3")),
    ("vorbis", "LIBNYQUIST_NO_NATIVE_VORBIS", str(DATA / "TestBeat.ogg")),
]

TIMER = """
import sys, time
sys.path.insert(0, {root!r})
import libnyquist_tpu as nq
f = {path!r}
a = nq.load(f)  # warm (imports, native build, map caches)
best = 1e9
for _ in range({repeat}):
    t0 = time.perf_counter()
    a = nq.load(f)
    best = min(best, time.perf_counter() - t0)
print(best, a.length_seconds)
"""


def run(path: str, env_extra: dict, repeat: int) -> tuple[float, float]:
    import os

    env = dict(os.environ)
    env.update(env_extra)
    r = subprocess.run(
        [sys.executable, "-c",
         TIMER.format(root=str(ROOT), path=path, repeat=repeat)],
        env=env, capture_output=True, text=True, check=True,
    )
    t, dur = r.stdout.split()
    return float(t), float(dur)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args(argv)

    rows = []
    for name, env_var, path in CASES:
        if not pathlib.Path(path).exists():
            print(f"# skip {name}: {path} missing", file=sys.stderr)
            continue
        t_native, dur = run(path, {}, args.repeat)
        t_python, _ = run(path, {env_var: "1"}, args.repeat)
        rows.append(dict(
            codec=name,
            audio_seconds=round(dur, 2),
            native_ms=round(t_native * 1e3, 1),
            python_ms=round(t_python * 1e3, 1),
            speedup=round(t_python / t_native, 2),
        ))
        print(f"{name:12s} native {t_native*1e3:8.1f} ms   "
              f"python {t_python*1e3:8.1f} ms   "
              f"speedup {t_python/t_native:6.2f}x", file=sys.stderr)
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
