#!/usr/bin/env python3
"""Fit the speech/music logistic for formats/opus/analysis.py.

The reference ships trained MLP weights inside libopus's analysis.c —
data we must not copy — so this script generates an ORIGINAL labelled
corpus (synthetic speech-like and music-like signals, seeded RNG, no
external audio) and fits a tiny logistic regression over the
context_features() in analysis.py.  Run it to reproduce (or retune)
the _WEIGHTS/_BIAS constants; it prints them in paste-ready form and
reports train/holdout accuracy per generator family.

Usage: python tools/train_mode_classifier.py [--epochs 400]
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from libnyquist_tpu.formats.opus import analysis  # noqa: E402

SR = 48000


def _norm(x, level=0.5):
    x = np.asarray(x, np.float64)
    m = np.abs(x).max()
    return (level * x / m if m > 0 else x).astype(np.float32)


# ------------------------- speech-like zoo -------------------------

def speech_voiced(rng, seconds=4.0):
    """Gliding pitch harmonics, syllabic AM, pauses, consonant bursts."""
    t = np.arange(int(SR * seconds)) / SR
    f0_base = rng.uniform(80, 260)
    # slow prosody glide + jitter
    f0 = f0_base * (1 + 0.15 * np.sin(2 * np.pi * rng.uniform(0.3, 1.2) * t)
                    + 0.08 * np.sin(2 * np.pi * rng.uniform(2.0, 4.0) * t))
    ph = np.cumsum(2 * np.pi * f0 / SR)
    x = sum(rng.uniform(0.1, 0.3) / np.sqrt(h) * np.sin(h * ph)
            for h in range(1, rng.integers(6, 12)))
    am = np.clip(np.sin(2 * np.pi * rng.uniform(2.0, 5.0) * t
                        + rng.uniform(0, 6)), 0, None) ** 2
    x = x * (0.15 + 0.85 * am)
    # word pauses: zero out random 150-400 ms stretches
    for _ in range(int(seconds * rng.uniform(0.5, 1.5))):
        p0 = rng.integers(0, len(t) - SR // 2)
        x[p0 : p0 + rng.integers(SR * 3 // 20, SR * 2 // 5)] *= 0.02
    # consonant bursts: short shaped-noise hits
    for _ in range(int(seconds * rng.uniform(2, 5))):
        p0 = rng.integers(0, len(t) - SR // 8)
        n = rng.integers(SR // 40, SR // 10)
        burst = rng.standard_normal(n) * np.hanning(n)
        x[p0 : p0 + n] += 0.3 * burst
    x += 0.01 * rng.standard_normal(len(t))
    return _norm(x, rng.uniform(0.3, 0.7))


def speech_whisper(rng, seconds=4.0):
    """Unvoiced speech: syllabically gated shaped noise."""
    t = np.arange(int(SR * seconds)) / SR
    n = rng.standard_normal(len(t))
    # crude formant shaping: differenced + smoothed noise mix
    lp = np.convolve(n, np.ones(9) / 9, mode="same")
    x = 0.6 * lp + 0.4 * np.diff(n, prepend=0.0)
    am = np.clip(np.sin(2 * np.pi * rng.uniform(2.5, 5.0) * t
                        + rng.uniform(0, 6)), 0, None) ** 2
    x = x * (0.05 + 0.95 * am)
    for _ in range(int(seconds)):
        p0 = rng.integers(0, len(t) - SR // 2)
        x[p0 : p0 + rng.integers(SR // 5, SR // 2)] *= 0.02
    return _norm(x, rng.uniform(0.2, 0.5))


def speech_hum(rng, seconds=4.0):
    """Continuously voiced speech (humming/sung-speech): deep slow
    pitch glide + syllabic AM, but no hard pauses or bursts.  Depth
    and rate separate it from instrumental vibrato (2% @ 5-6.5 Hz):
    prosodic glides are 5-15% at 1.5-4 Hz."""
    t = np.arange(int(SR * seconds)) / SR
    f0_base = rng.uniform(80, 260)
    f0 = f0_base * (1 + rng.uniform(0.05, 0.15)
                    * np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t
                             + rng.uniform(0, 6)))
    ph = np.cumsum(2 * np.pi * f0 / SR)
    x = sum(rng.uniform(0.1, 0.3) / np.sqrt(h) * np.sin(h * ph)
            for h in range(1, rng.integers(6, 10)))
    am = np.sin(2 * np.pi * rng.uniform(2.0, 4.0) * t
                + rng.uniform(0, 6)) ** 2
    x = x * (rng.uniform(0.3, 0.6) + rng.uniform(0.4, 0.7) * am)
    x += 0.02 * rng.standard_normal(len(t))
    return _norm(x, rng.uniform(0.3, 0.7))


def speech_dialog(rng, seconds=4.0):
    """Two alternating talkers with distinct f0."""
    a = speech_voiced(rng, seconds)
    b = speech_voiced(rng, seconds)
    g = (np.sin(2 * np.pi * rng.uniform(0.2, 0.5)
                * np.arange(len(a)) / SR) > 0)
    return _norm(np.where(g, a, b), rng.uniform(0.3, 0.6))


# ------------------------- music-like zoo --------------------------

def music_chords(rng, seconds=4.0):
    """Sustained chord pad: stacked stable harmonics, slow envelope."""
    t = np.arange(int(SR * seconds)) / SR
    root = rng.uniform(100, 400)
    x = np.zeros_like(t)
    for ratio in (1.0, 1.26, 1.5, 2.0):
        f = root * ratio
        for h in range(1, 5):
            x += (rng.uniform(0.05, 0.2) / h
                  * np.sin(2 * np.pi * f * h * t + rng.uniform(0, 6)))
    x *= 0.7 + 0.3 * np.sin(2 * np.pi * rng.uniform(0.1, 0.4) * t)
    return _norm(x, rng.uniform(0.3, 0.7))


def music_melody(rng, seconds=4.0):
    """Stepwise note melody: stable pitch inside each note."""
    t = np.arange(int(SR * seconds)) / SR
    scale = 220.0 * 2 ** (np.array([0, 2, 4, 5, 7, 9, 11, 12]) / 12.0)
    note_len = rng.uniform(0.12, 0.3)
    notes = rng.choice(scale, size=int(seconds / note_len) + 1)
    f0 = np.repeat(notes, int(SR * note_len))[: len(t)]
    f0 = np.concatenate([f0, np.full(len(t) - len(f0), notes[-1])])
    ph = np.cumsum(2 * np.pi * f0 / SR)
    x = sum(0.3 / h * np.sin(h * ph) for h in range(1, 6))
    env = np.ones_like(t)
    x *= env
    return _norm(x, rng.uniform(0.3, 0.7))


def music_vibrato(rng, seconds=4.0):
    """Lead tone with regular vibrato (periodic small glide)."""
    t = np.arange(int(SR * seconds)) / SR
    f = rng.uniform(200, 600)
    f0 = f * (1 + 0.02 * np.sin(2 * np.pi * rng.uniform(4.5, 6.5) * t))
    ph = np.cumsum(2 * np.pi * f0 / SR)
    x = sum(0.3 / h * np.sin(h * ph) for h in range(1, 5))
    return _norm(x, rng.uniform(0.3, 0.7))


def music_drums(rng, seconds=4.0):
    """Periodic transient train (kick + hat) over a bass line."""
    n = int(SR * seconds)
    x = np.zeros(n)
    beat = int(SR / rng.uniform(1.8, 2.4))
    for p0 in range(0, n - SR // 8, beat):
        k = np.exp(-np.arange(SR // 10) / (SR / 60.0))
        x[p0 : p0 + len(k)] += 0.8 * k * np.sin(
            2 * np.pi * 55 * np.arange(len(k)) / SR)
    for p0 in range(beat // 2, n - SR // 16, beat // 2):
        h = rng.standard_normal(SR // 30) * np.exp(
            -np.arange(SR // 30) / (SR / 300.0))
        x[p0 : p0 + len(h)] += 0.25 * h
    t = np.arange(n) / SR
    x += 0.3 * np.sin(2 * np.pi * 110 * t)
    return _norm(x, rng.uniform(0.3, 0.7))


def music_sweep(rng, seconds=4.0):
    """Slow chirp (continuous glide — a deliberate hard negative)."""
    t = np.arange(int(SR * seconds)) / SR
    f0 = 200 * 2 ** (t / seconds * rng.uniform(2, 4))
    ph = np.cumsum(2 * np.pi * f0 / SR)
    return _norm(np.sin(ph), rng.uniform(0.3, 0.7))


def music_noise(rng, seconds=4.0):
    """Broadband textures (rain/pad) — tonality-free negatives."""
    n = int(SR * seconds)
    x = rng.standard_normal(n)
    x = np.convolve(x, np.ones(5) / 5, mode="same")
    return _norm(x, rng.uniform(0.2, 0.5))


SPEECH = [speech_voiced, speech_whisper, speech_dialog, speech_hum]
MUSIC = [music_chords, music_melody, music_vibrato, music_drums,
         music_sweep, music_noise]


def build_corpus(seed, per_gen):
    rng = np.random.default_rng(seed)
    rows, labels, fams = [], [], []
    for gens, lab in ((SPEECH, 1.0), (MUSIC, 0.0)):
        for g in gens:
            for _ in range(per_gen):
                x = g(rng)
                raw = analysis.frame_features(x)
                feats = analysis.context_features(raw)
                # drop the context warm-up edges
                feats = feats[10:-10]
                rows.append(feats)
                labels.append(np.full(len(feats), lab))
                fams.append([g.__name__] * len(feats))
    X = np.concatenate(rows)
    y = np.concatenate(labels)
    fam = np.concatenate(fams)
    return X, y, fam


def fit_logistic(X, y, epochs=400, lr=0.5, l2=1e-4):
    mu, sd = X.mean(0), X.std(0) + 1e-9
    Xs = (X - mu) / sd
    w = np.zeros(X.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(epochs):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -40, 40)))
        g = p - y
        w -= lr * (Xs.T @ g / n + l2 * w)
        b -= lr * g.mean()
    # fold standardization into raw-space weights
    w_raw = w / sd
    b_raw = b - float((w * mu / sd).sum())
    return w_raw, b_raw


def main():
    epochs = 400
    if "--epochs" in sys.argv:
        epochs = int(sys.argv[sys.argv.index("--epochs") + 1])
    X, y, fam = build_corpus(seed=0, per_gen=6)
    Xh, yh, famh = build_corpus(seed=1, per_gen=2)
    w, b = fit_logistic(X, y, epochs=epochs)

    def acc(Xv, yv):
        p = 1.0 / (1.0 + np.exp(-np.clip(Xv @ w + b, -40, 40)))
        return float(((p > 0.5) == (yv > 0.5)).mean())

    print(f"train acc {acc(X, y):.4f}  holdout acc {acc(Xh, yh):.4f}")
    for f in np.unique(famh):
        m = famh == f
        print(f"  {f:<16} holdout acc {acc(Xh[m], yh[m]):.4f}")
    print("\n_WEIGHTS = np.array([")
    print("    " + ", ".join(f"{v:.5f}" for v in w[:4]) + ",")
    print("    " + ", ".join(f"{v:.5f}" for v in w[4:]) + ",")
    print("])")
    print(f"_BIAS = {b:.5f}")


if __name__ == "__main__":
    main()
