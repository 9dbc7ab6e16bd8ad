"""Per-stage decode profiling + device trace capture.

The reference ships two observability tools: the CUDA-event stage
breakdown printed by its batch-8 path (reference:
cuda/mdct_cuda_b8.cu:344-464 — H2D / pre-rotation / IFFT / post / D2H
percentages) and compile-time MDCT_PROFILE timers (mdct.c:274-277).
The TPU-framework equivalents here are:

- ``StageProfile`` — wall-clock stage recorder with the same style of
  report (stage, ms, share of total).
- ``profile_opus_load`` — stage breakdown of the whole-native Ogg Opus
  load path (demux/TOC scan, C entropy decode, BLAS/TPU synthesis,
  gain/trim), the analog of the B8 per-call printout.
- ``profile_load`` — coarse read/decode split for any format.
- ``device_trace`` — context manager around ``jax.profiler`` for XLA
  traces (view with tensorboard / xprof).

CLI: ``python -m libnyquist_tpu.utils.profiling FILE``.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Iterator, List, Tuple


@dataclass
class StageProfile:
    """Wall-clock stage recorder; report() mirrors the reference's
    CUDA-event percentage printout (mdct_cuda_b8.cu:430-464)."""

    stages: List[Tuple[str, float]] = field(default_factory=list)

    def record(self, name: str, seconds: float) -> None:
        self.stages.append((name, seconds))

    @contextlib.contextmanager
    def time(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    @property
    def total(self) -> float:
        return sum(s for _, s in self.stages)

    def report(self) -> str:
        total = self.total or 1e-12
        lines = [f"{'stage':<24s} {'ms':>9s} {'share':>7s}"]
        for name, s in self.stages:
            lines.append(
                f"{name:<24s} {s * 1e3:9.2f} {100.0 * s / total:6.1f}%"
            )
        lines.append(f"{'total':<24s} {total * 1e3:9.2f} {100.0:6.1f}%")
        return "\n".join(lines)


def profile_opus_load(data: bytes) -> StageProfile:
    """Stage breakdown of the whole-native Ogg Opus load
    (mirrors formats/opus._decode_via_native_scan stage for stage).
    Raises ValueError when the file needs the general (non-CELT-scan)
    path — profile those with profile_load instead."""
    import numpy as np

    from ..formats.opus.celt import (
        CeltDecoderState, _raw_to_infos, celt_decode_ogg_raw,
        celt_scan_ogg_native,
    )
    from ..runtime.opus_pipeline import synthesize_stream_host

    prof = StageProfile()
    with prof.time("ogg scan + TOC split"):
        scan = celt_scan_ogg_native(data)
    if scan is None:
        raise ValueError("not a single-stream CELT file; "
                         "use profile_load")
    channels = int(scan[6][0])
    st = CeltDecoderState(channels=channels)
    with prof.time("entropy decode (C)"):
        out = celt_decode_ogg_raw(st, data)
    if out is None:
        raise ValueError("entropy decode fell back; use profile_load")
    raw, scan_info = out[:8], out[8]
    with prof.time("frame marshalling"):
        infos = _raw_to_infos(st, raw)
    with prof.time("synthesis (GEMM+comb)"):
        pcm = np.asarray(synthesize_stream_host(infos, channels))
    with prof.time("gain + trim"):
        gain_q8 = int(scan_info[3])
        if gain_q8:
            pcm = pcm * (10.0 ** (gain_q8 / (20.0 * 256.0)))
        start = int(scan_info[1])
        end_granule = int(scan_info[7])
        end = min(pcm.shape[0], end_granule) if end_granule >= 0 \
            else pcm.shape[0]
        pcm = pcm[start:end]
    return prof


def profile_load(path: str) -> StageProfile:
    """Coarse read/decode breakdown for any supported format."""
    import pathlib

    from .. import io as nqio

    prof = StageProfile()
    with prof.time("read file"):
        data = pathlib.Path(path).read_bytes()
    ext = pathlib.Path(path).suffix.lstrip(".").lower()
    with prof.time("decode"):
        nqio.load(data, extension=ext)
    return prof


def xla_flops(jitted_fn, *args) -> float | None:
    """Total FLOPs of a jitted program per XLA's own cost model, or
    None when the backend can't report it (some PJRT plugins omit
    cost analysis).  Use with a measured wall time to report device
    FLOP/s and MFU (the reference's NCU-roofline analog)."""
    try:
        ca = jitted_fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def xla_cost(jitted_fn, *args) -> dict:
    """FLOPs + bytes accessed per XLA's cost model ({} when the
    backend omits cost analysis).  The bytes figure is the roofline
    denominator that actually matters for the decode value plane —
    it is data-movement-heavy by construction (scatters of trace
    markers, fills, windowed slices), so HBM-bandwidth utilization is
    the honest 'how close to peak' number; MFU is reported alongside
    for the matmul-heavy synthesis half."""
    try:
        ca = jitted_fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        out = {}
        if "flops" in ca:
            out["flops"] = float(ca["flops"])
        if "bytes accessed" in ca:
            out["bytes"] = float(ca["bytes accessed"])
        return out
    except Exception:
        return {}


# Published per-chip HBM bandwidth (GB/s) by TPU generation,
# substring-matched against PJRT device_kind (same scheme as the
# FLOPs table below).
_TPU_PEAK_GBPS = (
    ("v6", 1638.0),      # Trillium / v6e
    ("v5p", 2765.0),
    ("v5", 819.0),       # v5e
    ("v4", 1228.0),
    ("v3", 900.0),
    ("v2", 700.0),
)


def device_peak_gbps() -> float | None:
    """Per-chip HBM bandwidth: LIBNYQUIST_TPU_PEAK_GBPS env var if
    set, else device_kind lookup.  None on CPU/unknown."""
    import os

    env = os.environ.get("LIBNYQUIST_TPU_PEAK_GBPS")
    if env:
        return float(env)
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    if "tpu" not in kind and "v5" not in kind and "v4" not in kind:
        return None
    for sub, peak in _TPU_PEAK_GBPS:
        if sub in kind:
            return peak
    return None


# Published per-chip dense peak (TFLOP/s) by TPU generation, bf16
# MXU rate (the framework's matmuls run f32-in/bf16-accum-eligible;
# the bf16 figure is the roofline the reference's NCU analysis would
# use).  Substring-matched against PJRT device_kind.
_TPU_PEAK_TFLOPS = (
    ("v6", 918.0),       # Trillium / v6e
    ("v5p", 459.0),
    ("v5", 197.0),       # v5e / "TPU v5 lite"
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 46.0),
)


def device_peak_tflops() -> float | None:
    """Per-chip peak TFLOP/s: the LIBNYQUIST_TPU_PEAK_TFLOPS env var
    if set, else looked up from the live device's device_kind (so MFU
    lands in the bench JSON without per-rig configuration).  None on
    CPU or unknown kinds."""
    import os

    env = os.environ.get("LIBNYQUIST_TPU_PEAK_TFLOPS")
    if env:
        return float(env)
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    if "tpu" not in kind and "v5" not in kind and "v4" not in kind:
        return None
    for sub, peak in _TPU_PEAK_TFLOPS:
        if sub in kind:
            return peak
    return None


def flops_report(flops: float | None, seconds: float,
                 peak_tflops: float | None = None) -> str:
    """'x GFLOP, y TFLOP/s[, z% MFU]' — peak defaults to
    device_peak_tflops() (env override, else device_kind lookup)."""
    if not flops or seconds <= 0:
        return "flops: n/a"
    if peak_tflops is None:
        peak_tflops = device_peak_tflops()
    rate = flops / seconds
    s = f"{flops / 1e9:.2f} GFLOP, {rate / 1e12:.3f} TFLOP/s"
    if peak_tflops:
        s += f", {100.0 * rate / (peak_tflops * 1e12):.2f}% MFU"
    return s


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture an XLA device trace (jax.profiler.trace wrapper)."""
    import jax.profiler

    with jax.profiler.trace(logdir):
        yield


def main(argv=None) -> int:
    import argparse
    import pathlib

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("file")
    ap.add_argument("--trace-dir", help="also write a jax profiler "
                                        "trace here")
    args = ap.parse_args(argv)
    data = pathlib.Path(args.file).read_bytes()

    ctx = device_trace(args.trace_dir) if args.trace_dir \
        else contextlib.nullcontext()
    with ctx:
        if args.file.lower().endswith(".opus"):
            try:
                prof = profile_opus_load(data)
            except ValueError:
                prof = profile_load(args.file)
        else:
            prof = profile_load(args.file)
    print(prof.report())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
