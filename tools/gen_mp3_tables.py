"""Extract MP3 normative constant tables from minimp3.h as data.

The tables (Huffman codebooks, synthesis window, pow-4/3, scalefactor band
layouts — ISO 11172-3 constants) are parsed out of the reference header's
array literals and stored as libnyquist_tpu/data/mp3_tables.npz. Data
extraction only; no code is copied.
"""

import pathlib
import re

import numpy as np

SRC = pathlib.Path("/root/reference/third_party/minimp3/minimp3.h").read_text()
OUT = pathlib.Path(__file__).resolve().parent.parent / (
    "libnyquist_tpu/data/mp3_tables.npz"
)


def grab(name, decl_re=None):
    """Extract a C array literal by variable name."""
    pat = decl_re or (
        r"static const [a-z0-9_]+\s+" + re.escape(name)
        + r"\[[^=]*=\s*\{(.*?)\};"
    )
    m = re.search(pat, SRC, re.S)
    assert m, name
    body = m.group(1)
    # Strip comments and macro lines
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    nums = re.findall(r"-?\d+\.?\d*(?:e[+-]?\d+)?f?", body)
    vals = [float(x.rstrip("f")) for x in nums]
    return np.array(vals)


tables = {}
tables["tabs"] = grab("tabs").astype(np.int32)
tables["tab32"] = grab("tab32").astype(np.int32)
tables["tab33"] = grab("tab33").astype(np.int32)
tables["tabindex"] = grab("tabindex").astype(np.int32)
tables["g_linbits"] = grab("g_linbits").astype(np.int32)
tables["g_pow43"] = grab("g_pow43").astype(np.float64)
tables["g_scf_long"] = grab("g_scf_long").astype(np.int32).reshape(8, 23)
tables["g_scf_short"] = grab("g_scf_short").astype(np.int32).reshape(8, 40)
tables["g_scf_mixed_raw"] = grab("g_scf_mixed").astype(np.int32)
tables["g_scf_partitions"] = grab("g_scf_partitions").astype(
    np.int32
).reshape(3, 28)
tables["g_scfc_decode"] = grab("g_scfc_decode").astype(np.int32)
tables["g_mod"] = grab("g_mod").astype(np.int32)
tables["g_preamp"] = grab("g_preamp").astype(np.int32)
tables["g_expfrac"] = grab("g_expfrac").astype(np.float64)
tables["g_pan"] = grab("g_pan").astype(np.float64)
tables["g_aa"] = grab("g_aa").astype(np.float64).reshape(2, 8)
tables["g_twid9"] = grab("g_twid9").astype(np.float64)
tables["g_twid3"] = grab("g_twid3").astype(np.float64)
tables["g_mdct_window"] = grab("g_mdct_window").astype(np.float64).reshape(
    2, 18
)
tables["g_sec"] = grab("g_sec").astype(np.float64)
tables["g_win"] = grab("g_win").astype(np.float64)

# g_scf_mixed rows have unequal lengths in the source (36/40/36/...). Parse
# row by row to preserve structure.
m = re.search(
    r"static const uint8_t g_scf_mixed\[8\]\[40\] = \{(.*?)\};", SRC, re.S
)
rows = re.findall(r"\{([^}]*)\}", m.group(1))
mixed = np.zeros((8, 40), np.int32)
for i, row in enumerate(rows):
    vals = [int(x) for x in re.findall(r"\d+", row)]
    mixed[i, : len(vals)] = vals
tables["g_scf_mixed"] = mixed
del tables["g_scf_mixed_raw"]

OUT.parent.mkdir(exist_ok=True)
np.savez_compressed(OUT, **tables)
print(f"wrote {OUT}")
for k, v in tables.items():
    print(f"  {k}: {v.shape} {v.dtype}")
