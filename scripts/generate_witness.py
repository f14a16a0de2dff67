#!/usr/bin/env python
"""Generate a circom `.wtns` witness from a compiled `.wasm` witness
generator and a JSON input file — the reference's generate_witness.js
CLI (fixtures/sha256/sha256_js/generate_witness.js), with the wasm run
by the pure-Python interpreter instead of node.

Usage: python scripts/generate_witness.py <file.wasm> <input.json> <output.wtns>
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from zksaas_tpu.circom.witness_calc import WitnessCalculator


def main(argv: list[str]) -> int:
    if len(argv) != 4:
        print(__doc__.strip().splitlines()[-1])
        return 1
    wasm_path, input_path, out_path = argv[1:4]
    with open(input_path) as f:
        inputs = json.load(f)
    wc = WitnessCalculator.from_file(wasm_path)
    blob = wc.calculate_wtns_bin(inputs)
    with open(out_path, "wb") as f:
        f.write(blob)
    print(f"wrote {out_path}: {wc.witness_size} witness values, "
          f"{len(blob)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
