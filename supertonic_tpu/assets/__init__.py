from .store import (
    Assets,
    flatten_tree,
    load_assets,
    load_params,
    load_voice_style,
    save_assets,
    save_params,
    save_voice_style,
    synthesize_default_styles,
    unflatten_tree,
)

__all__ = [
    "Assets",
    "flatten_tree",
    "load_assets",
    "load_params",
    "load_voice_style",
    "save_assets",
    "save_params",
    "save_voice_style",
    "synthesize_default_styles",
    "unflatten_tree",
]
