"""Asset store round-trip tests."""

import numpy as np
import pytest

from supertonic_tpu.assets import (
    load_assets,
    load_params,
    load_voice_style,
    save_assets,
    save_params,
    save_voice_style,
    synthesize_default_styles,
    flatten_tree,
    unflatten_tree,
)
from supertonic_tpu.models import init_all


def test_flatten_unflatten_roundtrip(tiny_config):
    params = init_all(0, tiny_config)
    flat = flatten_tree(params)
    assert all(isinstance(k, str) and "/" in k for k in flat)
    rebuilt = unflatten_tree(flat)
    # lists (blocks) must come back as lists
    assert isinstance(rebuilt["vector_estimator"]["blocks"], list)
    f2 = flatten_tree(rebuilt)
    assert set(f2) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(flat[k], f2[k])


def test_params_npz_roundtrip(tiny_config, tmp_path):
    params = init_all(0, tiny_config)
    p = tmp_path / "params.npz"
    save_params(str(p), params)
    loaded = load_params(str(p))
    np.testing.assert_array_equal(
        loaded["vocoder"]["pre"]["w"], params["vocoder"]["pre"]["w"]
    )
    np.testing.assert_array_equal(
        loaded["vector_estimator"]["blocks"][1]["ffn"]["in"]["w"],
        params["vector_estimator"]["blocks"][1]["ffn"]["in"]["w"],
    )


def test_voice_style_reference_format_roundtrip(tiny_config, tmp_path):
    styles = synthesize_default_styles(tiny_config)
    p = tmp_path / "M1.json"
    save_voice_style(str(p), styles["M1"])
    loaded = load_voice_style([str(p)])
    np.testing.assert_allclose(loaded.ttl, styles["M1"].ttl, rtol=1e-6)
    np.testing.assert_allclose(loaded.dp, styles["M1"].dp, rtol=1e-6)


def test_voice_style_batch_stacking(tiny_config, tmp_path):
    styles = synthesize_default_styles(tiny_config)
    paths = []
    for name in ("M1", "F1", "M2"):
        p = tmp_path / f"{name}.json"
        save_voice_style(str(p), styles[name])
        paths.append(str(p))
    batch = load_voice_style(paths)
    assert batch.batch == 3
    np.testing.assert_allclose(batch.ttl[1], styles["F1"].ttl[0], rtol=1e-6)


def test_full_asset_bundle_roundtrip(tiny_config, tmp_path):
    params = init_all(3, tiny_config)
    save_assets(str(tmp_path), tiny_config, params)
    assets = load_assets(str(tmp_path))
    assert assets.cfg.chunk_size == tiny_config.chunk_size
    assert assets.cfg.ttl.latent_dim == tiny_config.ttl.latent_dim
    np.testing.assert_array_equal(
        assets.params["vocoder"]["pre"]["w"], params["vocoder"]["pre"]["w"]
    )
    style = assets.get_voice_style("F3")
    assert style.batch == 1
    ids, mask = assets.processor(["Hello."], ["en"])
    assert (ids > 0).sum() == mask.sum()


def test_missing_dir_falls_back(tmp_path):
    assets = load_assets(str(tmp_path / "nope"))
    assert assets.params is not None
    assert assets.get_voice_style("M1").batch == 1


def test_unknown_style_raises(tiny_config, tmp_path):
    save_assets(str(tmp_path), tiny_config, init_all(0, tiny_config))
    assets = load_assets(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        assets.get_voice_style("Q7")


def test_inspect_onnx_preflight(tmp_path):
    """tools/inspect_onnx reports executor support per graph (day-one
    preflight), including ops hidden inside subgraph bodies."""
    import sys

    sys.path.insert(0, "tools")
    import inspect_onnx

    from supertonic_tpu.assets import onnx_reader as R

    ok = R.encode_model(
        "g", [R.encode_node("Relu", ["x"], ["y"], name="n0")], [],
        [R.encode_value_info("x", np.float32, (2,))],
        [R.encode_value_info("y", np.float32, (2,))])
    bad = R.encode_model(
        "g", [R.encode_node("TotallyMadeUpOp", ["x"], ["y"], name="n0")], [],
        [R.encode_value_info("x", np.float32, (2,))],
        [R.encode_value_info("y", np.float32, (2,))])
    (tmp_path / "ok.onnx").write_bytes(ok)
    (tmp_path / "bad.onnx").write_bytes(bad)

    r = inspect_onnx.report(str(tmp_path / "ok.onnx"))
    assert r["unsupported_ops"] == []
    r = inspect_onnx.report(str(tmp_path / "bad.onnx"))
    assert r["unsupported_ops"] == ["TotallyMadeUpOp"]
