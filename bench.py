#!/usr/bin/env python3
"""Benchmark: multi-stream Opus/CELT decode throughput on one TPU chip.

Mirrors the reference's benchmark methodology (reference:
run_benchmark.py trimmed-median timing; cuda/mdct_cuda.cu:596-676
warmup + repeated timed calls) but measures the TPU-native pipeline:
batched MXU IMDCT + overlap-add + pitch postfilter scan + deemphasis —
the full dense half of Opus decode — over a batch of concurrent streams.

Prints ONE JSON line:
  {"metric": "opus_tpu_synthesis_realtime_x", "value": N,
   "unit": "audio_seconds_per_second_per_chip", "vs_baseline": N/500}

Baseline target: >=500x realtime per chip (BASELINE.md).
"""

import json
import struct
import sys
import time
import pathlib

import numpy as np

BREAKDOWN = "--breakdown" in sys.argv


def load_case0_infos(n_seconds=2.0):
    """Host entropy-decode golden case 0 (stereo CELT 20 ms music) once."""
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from libnyquist_tpu.formats.opus import celt
    from libnyquist_tpu.formats.opus.packet import parse_packet

    golden = pathlib.Path(__file__).parent / "tests/golden/opus_packets.bin"
    raw = golden.read_bytes()
    pos = 4
    ch, sr, n_packets, frame = struct.unpack_from("<4i", raw, pos)
    pos += 16
    pkts = []
    for _ in range(n_packets):
        (ln,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        pkts.append(raw[pos : pos + ln])
        pos += ln
    st = celt.CeltDecoderState(channels=ch)
    infos = []
    for p in pkts:
        pkt = parse_packet(p)
        for fr in pkt.frames:
            infos.append(celt.celt_decode_frame_to_freq(st, fr, pkt.frame_size))
    return infos, ch


def main():
    import jax

    try:  # persistent compile cache cuts repeat-run latency
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp

    from libnyquist_tpu.formats.opus.celt_tables import mode48000
    from libnyquist_tpu.ops import comb as comb_ops
    from libnyquist_tpu.ops import imdct as imdct_ops
    from libnyquist_tpu.ops import scan_iir
    from libnyquist_tpu.runtime import opus_pipeline

    mode = mode48000()
    infos, ch = load_case0_infos()
    # Keep only long-block frames for a uniform batch (the common case).
    infos = [i for i in infos if not i["shortBlocks"]]
    F = len(infos)
    N = infos[0]["N"]
    LM = infos[0]["LM"]
    audio_seconds_per_stream = F * N / 48000.0

    # Batch of B independent streams x 2 channels.
    B = 64
    rows = B * ch
    spectra = np.stack([i["freq"] for i in infos])        # [F, ch, N]
    spectra = spectra.transpose(1, 0, 2).astype(np.float32)  # [ch, F, N]
    spec_b = np.tile(spectra[None], (B, 1, 1, 1)).reshape(rows, F, N)

    fparams = opus_pipeline.postfilter_frame_params(infos)
    chunk = comb_ops.build_chunk_params(fparams, N, mode.window,
                                        mode.shortMdctSize)
    n_chunks = chunk["T0"].shape[0]
    Tm, Tp, Tt = imdct_ops.celt_synthesis_matrices_paired(
        (2 * mode.shortMdctSize) << LM, mode.overlap, 1)
    Tm, Tp, Tt = jnp.asarray(Tm), jnp.asarray(Tp), jnp.asarray(Tt)

    T0 = jnp.broadcast_to(jnp.asarray(chunk["T0"]), (rows, n_chunks))
    T1 = jnp.broadcast_to(jnp.asarray(chunk["T1"]), (rows, n_chunks))
    g0 = jnp.broadcast_to(jnp.asarray(chunk["gains0"]), (rows, n_chunks, 3))
    g1 = jnp.broadcast_to(jnp.asarray(chunk["gains1"]), (rows, n_chunks, 3))
    fade = jnp.broadcast_to(jnp.asarray(chunk["fade"]),
                            (rows, n_chunks, comb_ops.CHUNK))

    S = F * N
    pad = (-S) % scan_iir.BLOCK

    hp = jax.lax.Precision.HIGHEST

    @jax.jit
    def synth(spec, tails, comb_hist, deemph_mem):
        # Overlap-add folded into two aligned matmuls (no output
        # slicing): out[f] = spec[f] @ Tm + spec[f-1] @ Tp.
        flat = spec.reshape(rows * F, N)
        main = jnp.dot(flat, Tm, preferred_element_type=jnp.float32,
                       precision=hp)
        prev = jnp.concatenate(
            [jnp.zeros((rows, 1, N), jnp.float32), spec[:, :-1]], axis=1
        ).reshape(rows * F, N)
        shifted = jnp.dot(prev, Tp, preferred_element_type=jnp.float32,
                          precision=hp)
        raw = (main + shifted).reshape(rows, F, N)
        raw = raw.at[:, 0, : mode.overlap].add(tails).reshape(rows, S)
        new_tails = jnp.dot(spec[:, -1], Tt,
                            preferred_element_type=jnp.float32, precision=hp)
        y, new_hist = comb_ops.comb_filter(
            raw, comb_hist, T0, T1, g0, g1, fade
        )
        yp = jnp.pad(y, ((0, 0), (0, pad)))
        out, new_mem = scan_iir.deemphasis(yp, deemph_mem)
        pcm = out[:, :S] * (1.0 / 32768.0)
        return pcm, new_tails, new_hist, new_mem

    spec_d = jnp.asarray(spec_b)
    tails = jnp.zeros((rows, mode.overlap), jnp.float32)
    hist = jnp.zeros((rows, comb_ops.HIST), jnp.float32)
    mem = jnp.zeros((rows,), jnp.float32)

    def force(x):
        # A host transfer is the only reliable completion barrier here
        # (block_until_ready can return early through device tunnels).
        return float(np.asarray(jax.device_get(x[0, :1])[0]))

    # Warmup / compile.
    pcm, tails, hist, mem = synth(spec_d, tails, hist, mem)
    force(pcm)

    # Device-to-host latency can reach tens of ms through tunnels, so
    # chain CHUNK dependent iterations on device and pay one barrier per
    # timing sample (run_benchmark.py-style trimmed median over samples).
    chain = 25
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(chain):
            pcm, tails, hist, mem = synth(spec_d, tails, hist, mem)
        force(pcm)
        times.append((time.perf_counter() - t0) / chain)
    times.sort()
    trimmed = times[1:-1] if len(times) > 4 else times
    sec = float(np.median(trimmed))

    if BREAKDOWN:
        # Per-stage breakdown (SURVEY.md §5 tracing: the analog of the
        # reference's CUDA-event stage printout, mdct_cuda_b8.cu:344-464).
        @jax.jit
        def imdct_stage(spec, tails):
            flat = spec.reshape(rows * F, N)
            main = jnp.dot(flat, Tm, preferred_element_type=jnp.float32,
                           precision=hp)
            prev = jnp.concatenate(
                [jnp.zeros((rows, 1, N), jnp.float32), spec[:, :-1]], axis=1
            ).reshape(rows * F, N)
            raw = (main + jnp.dot(prev, Tp,
                                  preferred_element_type=jnp.float32,
                                  precision=hp)).reshape(rows, F, N)
            return raw.at[:, 0, : mode.overlap].add(tails).reshape(rows, S)

        @jax.jit
        def comb_stage(raw, hist):
            y, _ = comb_ops.comb_filter(raw, hist, T0, T1, g0, g1, fade)
            return y

        @jax.jit
        def deemph_stage(y, mem):
            out, _ = scan_iir.deemphasis(jnp.pad(y, ((0, 0), (0, pad))), mem)
            return out

        raw = imdct_stage(spec_d, tails)
        yc = comb_stage(raw, hist)
        force(deemph_stage(yc, mem))
        stages = [("imdct+ola", imdct_stage, (spec_d, tails)),
                  ("comb", comb_stage, (raw, hist)),
                  ("deemph", deemph_stage, (yc, mem))]
        stage_ms = {}
        for name, fn, args in stages:
            t0 = time.perf_counter()
            r = None
            for _ in range(chain):
                r = fn(*args)
            force(r)
            stage_ms[name] = (time.perf_counter() - t0) / chain * 1e3
        total = sum(stage_ms.values())
        for name, ms in stage_ms.items():
            print(f"# {name:10s} {ms:7.3f} ms  {100 * ms / total:5.1f}%",
                  file=sys.stderr)
        print(f"# stage sum  {total:7.3f} ms vs fused {sec * 1e3:7.3f} ms",
              file=sys.stderr)

    total_audio = B * audio_seconds_per_stream
    realtime_x = total_audio / sec
    result = {
        "metric": "opus_tpu_synthesis_realtime_x",
        "value": round(realtime_x, 1),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(realtime_x / 500.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
