"""Extract the CCSDS compact generator-matrix constants from the reference crate.

The arrays in /root/reference/src/codes/compact_generators.rs are pure data:
the first rows of each circulant block of the parity part of each systematic
generator matrix, bit-packed into u64s, as defined by CCSDS 231.1-O-1 and
CCSDS 131.0-B-2. This script parses the hex literals and emits a Python data
module (`labrador_ldpc_tpu/codes/_generator_data.py`).

Run from the repo root:  python tools/extract_generators.py
"""

import re
from pathlib import Path

SRC = Path("/root/reference/src/codes/compact_generators.rs")
DST = Path(__file__).resolve().parent.parent / "labrador_ldpc_tpu" / "codes" / "_generator_data.py"

# (name, rows = k/circulant_size, row_len = (n-k)/64)
SHAPES = {
    "TC128_G": (4, 1),
    "TC256_G": (4, 2),
    "TC512_G": (4, 4),
    "TM1280_G": (32, 4),
    "TM1536_G": (16, 8),
    "TM2048_G": (8, 16),
    "TM5120_G": (32, 16),
    "TM6144_G": (16, 32),
    "TM8192_G": (8, 64),
}


def main():
    text = SRC.read_text()
    out = [
        '"""CCSDS compact generator-matrix constants (pure data).',
        "",
        "Each entry is the parity-column block of a systematic generator matrix in",
        "compact circulant form: one u64-packed row per circulant block of k rows",
        "(row r of the full G is the (r mod circulant_size)-th right-rotation of the",
        "compact row r // circulant_size). Values are CCSDS-defined constants",
        "(CCSDS 231.1-O-1 / 131.0-B-2); layout documented in the reference crate at",
        "src/codes/compact_generators.rs:3-9 and src/codes/mod.rs:11-19.",
        '"""',
        "",
        "# fmt: off",
    ]
    for name, (rows, row_len) in SHAPES.items():
        m = re.search(rf"pub static {name}: \[u64; [^\]]*\] = \[(.*?)\];", text, re.S)
        assert m, name
        vals = re.findall(r"0x([0-9A-Fa-f]+)", m.group(1))
        assert len(vals) == rows * row_len, (name, len(vals), rows * row_len)
        out.append(f"{name} = [  # rows={rows} (k/circ), row_len={row_len} u64s ((n-k)/64)")
        for i in range(0, len(vals), 4):
            chunk = ", ".join(f"0x{v.upper()}" for v in vals[i : i + 4])
            out.append(f"    {chunk},")
        out.append("]")
        out.append("")
    out.append("COMPACT_GENERATORS = {")
    for name in SHAPES:
        out.append(f'    "{name[:-2]}": {name},')
    out.append("}")
    out.append("")
    DST.write_text("\n".join(out))
    print(f"wrote {DST} ({sum(r * l for r, l in SHAPES.values())} u64 values)")


if __name__ == "__main__":
    main()
