"""mp3 decoder — placeholder, implemented in a later milestone."""
from ..audio_data import AudioData
from ..errors import DecodeError


def decode_mp3_buffer(data: bytes, audio: AudioData) -> None:
    raise DecodeError("mp3 decoding not yet implemented")
