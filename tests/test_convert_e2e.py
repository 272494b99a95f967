"""End-to-end ONNX->JAX conversion test.

Builds a synthetic "reference checkpoint": four ONNX files whose
initializers carry torch-export-style names and layouts ([out,in] linears,
[out,in,k] convs), then runs the full convert() pipeline (dependency-free
protobuf parse -> regex mapping -> shape validation -> params.npz bundle)
and checks the loaded engine reproduces the source weights bit-exactly.
This is the exact workflow that will ingest the real Hugging Face assets.
"""

import os

import numpy as np
import pytest

from supertonic_tpu.assets.convert import MappingRule, convert, t_conv, t_linear
from supertonic_tpu.assets.onnx_reader import encode_model, encode_tensor
from supertonic_tpu.assets.store import flatten_tree, save_assets, load_assets
from supertonic_tpu.models import init_all


@pytest.fixture(scope="module")
def fake_onnx_dir(tiny_config, tmp_path_factory):
    """Export tiny-config random params AS ONNX files with torch-ish names."""
    d = tmp_path_factory.mktemp("onnx")
    params = init_all(7, tiny_config)

    for model_name, tree in params.items():
        flat = flatten_tree(tree)
        inits = []
        for path, arr in flat.items():
            torch_name = path.replace("/", ".")
            if path.endswith("/w") and arr.ndim == 2:
                # torch Linear stores [out, in]
                inits.append(encode_tensor(torch_name, np.ascontiguousarray(arr.T)))
            elif path.endswith("/w") and arr.ndim == 3:
                # torch Conv1d stores [out, in, k]; ours is [k, in, out]
                inits.append(encode_tensor(
                    torch_name, np.ascontiguousarray(np.transpose(arr, (2, 1, 0)))
                ))
            else:
                inits.append(encode_tensor(torch_name, np.asarray(arr)))
        with open(os.path.join(d, f"{model_name}.onnx"), "wb") as f:
            f.write(encode_model(model_name, [], inits))
    return str(d), params


def test_convert_roundtrip(fake_onnx_dir, tiny_config, tmp_path):
    onnx_dir, src_params = fake_onnx_dir

    # mapping: translate dotted torch names back to our slashed paths.
    # Because the synthetic export uses OUR structure with torch layouts,
    # two generic rules suffice: conv weights (3-D) and linears (2-D).
    def apply_rules(inits):
        flat = {}
        unmapped: list[str] = []
        for name, arr in inits.items():
            path = name.replace(".", "/")
            if path.endswith("/w") and arr.ndim == 3:
                flat[path] = t_conv(arr)
            elif path.endswith("/w") and arr.ndim == 2:
                flat[path] = t_linear(arr)
            else:
                flat[path] = arr
        return flat, unmapped

    # drive the official pipeline pieces
    from supertonic_tpu.assets.convert import (
        extract_onnx_dir,
        validate_against_skeleton,
    )

    extracted = extract_onnx_dir(onnx_dir)
    assert set(extracted) == {
        "duration_predictor", "text_encoder", "vector_estimator", "vocoder"
    }

    flat_all = {}
    for model, inits in extracted.items():
        flat, unmapped = apply_rules(inits)
        assert not unmapped
        flat_all.update({f"{model}/{k}": v for k, v in flat.items()})

    problems = validate_against_skeleton(flat_all, tiny_config)
    assert problems == {}, problems

    # materialize the bundle and load it back through the normal path
    from supertonic_tpu.assets.store import unflatten_tree

    params = unflatten_tree(flat_all)
    out_dir = tmp_path / "assets"
    save_assets(str(out_dir), tiny_config, params)
    assets = load_assets(str(out_dir))

    src_flat = flatten_tree(src_params)
    got_flat = flatten_tree(assets.params)
    assert set(src_flat) == set(got_flat)
    for k in src_flat:
        np.testing.assert_array_equal(
            got_flat[k], np.asarray(src_flat[k]), err_msg=k
        )


def test_convert_official_entrypoint_lenient(fake_onnx_dir, tiny_config):
    """convert() with an empty mapping in lenient mode falls back to the
    skeleton and reports every initializer unmapped — the workflow's
    discovery mode for writing the real mapping table."""
    onnx_dir, _ = fake_onnx_dir
    params, report = convert(onnx_dir, tiny_config, rules={}, strict=False)
    assert set(report) == {
        "duration_predictor", "text_encoder", "vector_estimator", "vocoder"
    }
    assert all(len(v) > 0 for v in report.values())
    from supertonic_tpu.models.layers import count_params

    assert count_params(params) > 0
