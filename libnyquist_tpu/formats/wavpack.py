"""wavpack decoder — placeholder, implemented in a later milestone."""
from ..audio_data import AudioData
from ..errors import DecodeError


def decode_wavpack_buffer(data: bytes, audio: AudioData) -> None:
    raise DecodeError("wavpack decoding not yet implemented")
