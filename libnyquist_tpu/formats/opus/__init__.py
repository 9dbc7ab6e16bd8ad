"""Ogg Opus decoder — placeholder, implemented in a later milestone."""
from ...audio_data import AudioData
from ...errors import DecodeError


def decode_opus_buffer(data: bytes, audio: AudioData) -> None:
    raise DecodeError("opus decoding not yet implemented")
