"""Per-format host-side decoders (bitstream parsing + TPU op dispatch)."""
