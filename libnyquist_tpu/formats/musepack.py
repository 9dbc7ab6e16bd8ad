"""musepack decoder — placeholder, implemented in a later milestone."""
from ..audio_data import AudioData
from ..errors import DecodeError


def decode_musepack_buffer(data: bytes, audio: AudioData) -> None:
    raise DecodeError("musepack decoding not yet implemented")
