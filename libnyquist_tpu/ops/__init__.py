"""TPU compute ops: the dense half of every decode pipeline."""
