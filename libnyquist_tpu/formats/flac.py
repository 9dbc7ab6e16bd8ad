"""flac decoder — placeholder, implemented in a later milestone."""
from ..audio_data import AudioData
from ..errors import DecodeError


def decode_flac_buffer(data: bytes, audio: AudioData) -> None:
    raise DecodeError("flac decoding not yet implemented")
