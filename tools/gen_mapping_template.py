#!/usr/bin/env python
"""Generate a mapping-table template for ONNX->JAX weight conversion.

Round-2 workflow once real Hugging Face assets are reachable:

    1. python tools/convert_onnx.py --onnx-dir assets/onnx --list-only
         -> initializer names+shapes of the real graphs
    2. python tools/gen_mapping_template.py > mapping.py
         -> our full param skeleton (path + shape) with rule stubs
    3. Fill in the regexes pairing (1) with (2); transposes:
         torch Linear [out,in] -> t_linear; torch Conv1d [out,in,k] -> t_conv
    4. python tools/convert_onnx.py --onnx-dir assets/onnx --mapping mapping.py --out assets
    5. pytest tests/test_oracle_parity.py with the ONNX oracle swapped in.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from supertonic_tpu.assets.store import flatten_tree
    from supertonic_tpu.config import TTSConfig
    from supertonic_tpu.models import init_all

    cfg = TTSConfig()
    flat = flatten_tree(init_all(0, cfg))
    print("# Auto-generated mapping template (tools/gen_mapping_template.py).")
    print("# Fill each rule's pattern with the real ONNX initializer regex.")
    print("from supertonic_tpu.assets.convert import MappingRule, t_conv, t_linear")
    print()
    print("RULES = {")
    by_model: dict[str, list[str]] = {}
    for path, arr in sorted(flat.items()):
        model, rest = path.split("/", 1)
        kind = ""
        if rest.endswith("/w"):
            kind = ", t_conv" if arr.ndim == 3 else ", t_linear"
        by_model.setdefault(model, []).append(
            f"    # {rest:55s} {str(tuple(arr.shape)):20s}\n"
            f"    # MappingRule(r'<onnx-name-regex>', r'{rest}'{kind}),"
        )
    for model, lines in by_model.items():
        print(f'  "{model}": [')
        print("\n".join(lines))
        print("  ],")
    print("}")


if __name__ == "__main__":
    main()
