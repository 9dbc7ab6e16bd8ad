"""vorbis decoder — placeholder, implemented in a later milestone."""
from ..audio_data import AudioData
from ..errors import DecodeError


def decode_vorbis_buffer(data: bytes, audio: AudioData) -> None:
    raise DecodeError("vorbis decoding not yet implemented")
