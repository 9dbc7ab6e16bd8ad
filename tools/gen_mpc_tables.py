"""Extract Musepack normative tables from libmpcdec sources as data.

Parses the huffman/canonical-huffman initializer lists in huffman.c, the
requantization constants in requant.c and the synthesis window in
synth_filter.c (ISO 11172-3-derived constants) into
libnyquist_tpu/data/mpc_tables.npz. Data extraction only.
"""

import pathlib
import re

import numpy as np

SRC_DIR = pathlib.Path("/root/reference/third_party/musepack/libmpcdec")
OUT = pathlib.Path(__file__).resolve().parent.parent / (
    "libnyquist_tpu/data/mpc_tables.npz"
)

huff_src = (SRC_DIR / "huffman.c").read_text()
req_src = (SRC_DIR / "requant.c").read_text()
synth_src = (SRC_DIR / "synth_filter.c").read_text()

tables = {}

# --- huffman tables: arrays of {Code, Length, Value} triples ---
for m in re.finditer(
    r"const mpc_huffman\s+(\w+)\s*\[([^\]]*)\]\s*(?:\[(\d+)\])?\s*=\s*\{(.*?)\n\};",
    huff_src, re.S,
):
    name, d1, d2, body = m.group(1), m.group(2), m.group(3), m.group(4)
    triples = re.findall(r"\{\s*(0x[0-9a-fA-F]+|\d+)\s*,\s*(\d+)\s*,\s*(-?\d+)\s*\}", body)
    arr = np.array(
        [[int(a, 0), int(b), int(c)] for a, b, c in triples], np.int32
    )
    if d2:  # 2D table [2][n]
        arr = arr.reshape(2, -1, 3)
    tables[f"huff_{name}"] = arr

# --- symbol tables ---
for m in re.finditer(
    r"const mpc_int8_t\s+(\w+)\s*\[\s*\d*\s*\]\s*=\s*\{(.*?)\};",
    huff_src, re.S,
):
    name, body = m.group(1), m.group(2)
    vals = [int(x) for x in re.findall(r"-?\d+", body)]
    tables[f"sym_{name}"] = np.array(vals, np.int32)

# --- requant constants ---
m = re.search(r"__Cc\s*\[[^\]]*\]\s*=\s*\{(.*?)\};", req_src, re.S)
ccs = re.findall(r"_\(\s*([0-9.]+)f?\s*\)", m.group(1))
tables["Cc"] = np.array([float(x) for x in ccs], np.float64) / (1 << 14)
m = re.search(r"__Dc\s*\[[^\]]*\]\s*=\s*\{(.*?)\};", req_src, re.S)
tables["Dc"] = np.array(
    [int(x) for x in re.findall(r"-?\d+", m.group(1))], np.int32
)
m = re.search(r"Res_bit\s*\[[^\]]*\]\s*=\s*\{(.*?)\};", req_src, re.S)
tables["Res_bit"] = np.array(
    [int(x) for x in re.findall(r"\d+", m.group(1))], np.int32
)

# --- synthesis window Di_opt [32][16], float scale /65536 ---
m = re.search(
    r"Di_opt\s*\[32\]\s*\[16\]\s*=\s*\{(.*?)\n\};", synth_src, re.S
)
vals = re.findall(r"_\(\s*(-?\d+)\s*\)", m.group(1))
assert len(vals) == 512, len(vals)
tables["Di_opt"] = (
    np.array([int(x) for x in vals], np.float64).reshape(32, 16) / 65536.0
)

np.savez_compressed(OUT, **tables)
print(f"wrote {OUT}")
for k in sorted(tables):
    print(f"  {k}: {tables[k].shape}")
