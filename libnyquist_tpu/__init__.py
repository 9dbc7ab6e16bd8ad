"""libnyquist_tpu: TPU-native audio decoding framework.

A ground-up rebuild of dafx/libnyquist for TPU: host CPU handles container
demux and entropy decoding; batched JAX/Pallas kernels handle every dense
transform (IMDCT, filterbanks, LPC synthesis, sample conversion, SRC).
"""

from .audio_data import AudioData, PCMFormat
from .errors import (
    DecodeError,
    LoadBufferNotImplementedError,
    LoadPathNotImplementedError,
    NyquistError,
    TruncatedDataError,
    UnsupportedExtensionError,
)
from .io import NyquistIO, is_file_supported, load
from .streaming import (
    ChainedOggSeekReader,
    FlacSeekReader,
    Mp3SeekReader,
    OggSeekReader,
    StreamReader,
    seek_reader,
)


def open_url(url: str, **kw):
    """Lazy seek reader over HTTP(S) — opusfile op_url analog (lazy
    import keeps `import libnyquist_tpu` socket/ssl-free otherwise)."""
    from .net import open_url as _open_url

    return _open_url(url, **kw)


def load_url(url: str, extension=None, **kw):
    """Full decode of an HTTP(S) resource through the facade."""
    from .net import load_url as _load_url

    return _load_url(url, extension=extension, **kw)


def resample(x, sr_in: int, sr_out: int, **kwargs):
    """Batched polyphase SRC (lazy import keeps `import libnyquist_tpu`
    jax-free for pure host decoding)."""
    from .ops.src import resample as _resample

    return _resample(x, sr_in, sr_out, **kwargs)


__version__ = "0.1.0"
__all__ = [
    "AudioData",
    "PCMFormat",
    "NyquistIO",
    "load",
    "is_file_supported",
    "resample",
    "StreamReader",
    "OggSeekReader",
    "ChainedOggSeekReader",
    "Mp3SeekReader",
    "FlacSeekReader",
    "seek_reader",
    "open_url",
    "load_url",
    "NyquistError",
    "DecodeError",
    "TruncatedDataError",
    "UnsupportedExtensionError",
    "LoadPathNotImplementedError",
    "LoadBufferNotImplementedError",
]
