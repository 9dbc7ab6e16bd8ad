"""SILK decoder — implemented in a later milestone this round."""
from ...errors import DecodeError


class SilkDecoder:
    def __init__(self, channels: int):
        self.channels = channels

    def decode(self, dec, n_channels_internal, internal_rate, payload_ms,
               total_ms):
        raise DecodeError("SILK decoding not yet implemented")
