"""8-channel multistream Ogg Opus (channel mapping family 1).

The reference validates this path with Rachel8ch.opus (oracle
int(sum)==40, 127,712,488 samples, Main.cpp:147).  That blob is
stripped from the reference checkout (.MISSING_LARGE_BLOBS) and CANNOT
be regenerated here: test_data/RachelReadme.txt's recipe starts from
ten 24-bit stems downloaded from cambridge-mt.com (sox merge + ffmpeg
libopus), and this environment has no network egress — nor would a
fresh ffmpeg/libopus encode reproduce the original encoder output
byte-for-byte, so the checksum oracle is tied to the lost blob, not
just the recipe.  The fixture here is instead a synthetic
4-coupled-stream file built from sb-reverie packets by
tools/gen_ms_opus.py, with the golden decoded by the reference oracle.
Exercises: RFC 7845 family-1 demux, RFC 6716 Appendix B self-delimited
packets, per-stream decoder state, channel mapping."""

import pathlib

import numpy as np

import libnyquist_tpu as nq

from .helpers import assert_matches_golden

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def test_multistream_8ch():
    audio = nq.load(str(FIXTURES / "ms8ch.opus"))
    assert audio.channel_count == 8
    assert_matches_golden(audio, "ms8ch", tol=1e-4)
