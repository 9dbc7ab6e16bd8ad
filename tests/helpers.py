"""Shared test helpers: golden fixture comparison."""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def load_golden(name: str):
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        pytest.skip(f"golden fixture {name} not generated")
    return np.load(path)


def assert_matches_golden(audio, name: str, tol: float = 1e-4):
    """Compare an AudioData result against a stored reference decode."""
    g = load_golden(name)
    assert audio.channel_count == int(g["channels"])
    assert audio.sample_rate == int(g["rate"])
    assert audio.sample_count == int(g["count"]), (
        f"sample count {audio.sample_count} != golden {int(g['count'])}"
    )
    s = np.asarray(audio.samples, dtype=np.float32)
    if "full" in g.files:
        err = np.abs(s - g["full"]).max() if s.size else 0.0
        assert err < tol, f"max abs err {err} vs full golden"
    else:
        head = g["head"]
        err = np.abs(s[: head.size] - head).max()
        assert err < tol, f"max abs err {err} vs golden head"
        stride = g["stride997"]
        err = np.abs(s[::997] - stride).max()
        assert err < tol, f"max abs err {err} vs golden stride"
    total = s.astype(np.float64).sum()
    assert abs(total - float(g["sum64"])) < max(1e-2, tol * s.size), (
        f"sum {total} vs golden {float(g['sum64'])}"
    )


# ---------------------------------------------------------------------------
# Reference-oracle captures for encoder tests (VERDICT r4 item 3).
#
# The encoder tests validate our Ogg Opus encoder by decoding its output
# with the REFERENCE decoder (oracle_dump over /root/reference's own
# libnyquist or stock libopus) and comparing against our decoder.  The
# oracle binaries live in /tmp and evaporate between checkouts, so the
# oracle outputs are captured as committed goldens: each capture pins
# BOTH the encoder's exact output bytes and the reference decode of
# them.  Regenerate with LIBNYQUIST_REGEN_ORACLE=1 after building the
# oracles (cmake /root/reference -> /tmp/refbuild + tools/oracle_dump.cpp;
# tools/build_stock_oracle.sh -> /tmp/stockopus).
# ---------------------------------------------------------------------------

ORACLE_GOLDEN_DIR = GOLDEN_DIR / "oracle"
REFBUILD_ORACLE = "/tmp/refbuild/oracle_dump"
STOCK_ORACLE = "/tmp/stockopus/oracle_dump"


def _regen_mode() -> bool:
    import os

    return bool(os.environ.get("LIBNYQUIST_REGEN_ORACLE"))


def _run_oracle(oracle_bin: str, blob: bytes):
    """Live oracle run: decode `blob` (an .opus stream) to float32 PCM."""
    import struct
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = pathlib.Path(td) / "in.opus"
        p.write_bytes(blob)
        out = pathlib.Path(td) / "out.raw"
        subprocess.run([oracle_bin, str(p), str(out)], check=True,
                       capture_output=True, timeout=120)
        raw = out.read_bytes()
    channels = struct.unpack("<I", raw[4:8])[0]
    (count,) = struct.unpack("<Q", raw[12:20])
    ref = np.frombuffer(raw[20:], np.float32)[:count].copy()
    return ref, int(channels)


def oracle_decode(name: str, blob: bytes, oracle_bin: str = REFBUILD_ORACLE):
    """Decode `blob` with the reference oracle, via the committed capture.

    Returns the reference decoder's float32 PCM for `blob`.  Fails (not
    skips) when the committed capture's encoded bytes differ from
    `blob` — that means the encoder's output changed and the capture
    must be regenerated against the live oracle.
    """
    path = ORACLE_GOLDEN_DIR / f"{name}.npz"
    if _regen_mode():
        if not pathlib.Path(oracle_bin).exists():
            pytest.skip(f"regen requested but oracle {oracle_bin} not built")
        ref, channels = _run_oracle(oracle_bin, blob)
        ORACLE_GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path, blob=np.frombuffer(blob, np.uint8), ref=ref,
            channels=channels)
        return ref
    if not path.exists():
        if pathlib.Path(oracle_bin).exists():
            ref, _channels = _run_oracle(oracle_bin, blob)  # live fallback
            return ref
        pytest.skip(f"oracle capture {name} not committed and oracle "
                    f"binary not built")
    g = np.load(path)
    stored = g["blob"].tobytes()
    assert stored == blob, (
        f"encoder output for {name} differs from the committed oracle "
        f"capture ({len(blob)} vs {len(stored)} bytes); the encoder "
        f"changed — regenerate with LIBNYQUIST_REGEN_ORACLE=1 after "
        f"building the oracle (see tests/helpers.py header)")
    return np.asarray(g["ref"], np.float32)


RD_PROBE = "/tmp/opus_rd_ref"


def rd_probe(name: str, sig: np.ndarray, channels: int, bps: int,
             frame_ms10: int):
    """Reference libopus encode->decode RD probe (tools/opus_rd_ref.c),
    served from a committed capture.  The probe input is our
    deterministic test signal (independent of our encoder), so the
    capture is stable; regenerate with LIBNYQUIST_REGEN_ORACLE=1 after
    building /tmp/opus_rd_ref (build line in tools/opus_rd_ref.c).
    Returns (bytes, snr_db) of the reference encoder at this rate."""
    import json
    import subprocess
    import tempfile

    path = ORACLE_GOLDEN_DIR / f"{name}.json"

    def _live():
        with tempfile.NamedTemporaryFile(suffix=".f32") as f:
            np.asarray(sig, np.float32).tofile(f.name)
            r = subprocess.run(
                [RD_PROBE, f.name, str(channels), str(bps),
                 str(frame_ms10)],
                capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        b, snr = r.stdout.split()
        return int(b), float(snr)

    sig_sum = float(np.asarray(sig, np.float64).sum())
    if _regen_mode():
        if not pathlib.Path(RD_PROBE).exists():
            pytest.skip(f"regen requested but {RD_PROBE} not built")
        nbytes, snr = _live()
        ORACLE_GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(
            {"bytes": nbytes, "snr_db": snr, "sig_sum64": sig_sum,
             "sig_len": int(np.asarray(sig).size)}))
        return nbytes, snr
    if not path.exists():
        if pathlib.Path(RD_PROBE).exists():
            return _live()
        pytest.skip(f"RD capture {name} not committed and {RD_PROBE} "
                    f"not built")
    g = json.loads(path.read_text())
    assert g["sig_len"] == int(np.asarray(sig).size) and \
        abs(g["sig_sum64"] - sig_sum) < 1e-6, (
        f"RD probe input for {name} changed; regenerate with "
        f"LIBNYQUIST_REGEN_ORACLE=1")
    return int(g["bytes"]), float(g["snr_db"])


def oracle_capture(name: str, blob: bytes, live_fn, binary: str):
    """Generic committed oracle capture: `live_fn(blob)` runs the live
    oracle binary and returns a float32 array.  Same regen / staleness
    rules as oracle_decode."""
    path = ORACLE_GOLDEN_DIR / f"{name}.npz"
    if _regen_mode():
        if not pathlib.Path(binary).exists():
            pytest.skip(f"regen requested but oracle {binary} not built")
        ref = np.asarray(live_fn(blob), np.float32)
        ORACLE_GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(path, blob=np.frombuffer(blob, np.uint8),
                            ref=ref)
        return ref
    if not path.exists():
        if pathlib.Path(binary).exists():
            return np.asarray(live_fn(blob), np.float32)
        pytest.skip(f"oracle capture {name} not committed and oracle "
                    f"binary not built")
    g = np.load(path)
    assert g["blob"].tobytes() == blob, (
        f"oracle input for {name} differs from the committed capture; "
        f"regenerate with LIBNYQUIST_REGEN_ORACLE=1")
    return np.asarray(g["ref"], np.float32)
