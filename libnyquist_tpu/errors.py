"""Exception hierarchy for libnyquist_tpu.

Mirrors the reference's error surface (reference:
include/libnyquist/Decoders.h:69-71 declares UnsupportedExtensionEx,
LoadPathNotImplEx, LoadBufferNotImplEx; throw sites in src/Common.cpp and
src/WavDecoder.cpp) but as an idiomatic Python hierarchy.
"""

from __future__ import annotations


class NyquistError(Exception):
    """Base class for all libnyquist_tpu errors."""


class UnsupportedExtensionError(NyquistError):
    """No decoder is registered for the requested extension / magic bytes."""


class LoadPathNotImplementedError(NyquistError):
    """The decoder cannot load from a filesystem path."""


class LoadBufferNotImplementedError(NyquistError):
    """The decoder cannot load from an in-memory buffer."""


class DecodeError(NyquistError):
    """Malformed or unsupported bitstream content."""


class TruncatedDataError(DecodeError):
    """Stream ended before the declared payload was complete."""
