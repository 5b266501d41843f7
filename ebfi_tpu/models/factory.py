"""Model construction from config dicts.

Accepts both this framework's snake_case argument names and the reference's
YAML keys (config/train_ours.yml:26-57) so reference configs work
unchanged.
"""
from __future__ import annotations

from typing import Dict

from .evfi import EVFIAutoEx
from .exposure import ExposureDecision

_EVFI_KEYMAP = {
    "FrameBasech": "frame_basech",
    "EventBasech": "event_basech",
    "InterCH": "inter_ch",
    "TB": "tb",
    "norm": "norm",
    "activation": "activation",
    "BlurryFashion": "blurry_fashion",
    "BLInch": "bl_in",
    "UseEvents": "use_events",
    "UseGTEx": "use_gt_ex",
    "FixEx": "fix_ex",
    "FrozenEX": "frozen_ex",
    "step": "step",
    "DualPath": "dual_path",
    "residual": "residual",
    "DetailEnabled": "detail_enabled",
    "channels": "channels",
    # framework extension (not a reference key): enable the fast execution
    # variants for TRAINING too — same math, gradient-parity-tested
    # (tests/test_models.py::test_fast_variants_gradients_match_standard)
    "FastVariants": "_fast_variants",
}
# handled by the trainer, not the module
_EVFI_IGNORED = {"LoadPretrainEX", "PretrainedEXPath"}

_EXPOSURE_KEYMAP = {
    "EventInch": "event_in",
    "BLInch": "bl_in",
    "InterCH": "inter_ch",
    "Group": "groups",
    "norm": "norm",
    "activation": "activation",
}
# BlurryFashion configures the trainer-side blurriness map, not the module
_EXPOSURE_IGNORED = {"LoadPretrain", "PretrainedEXPath", "Frozen", "BlurryFashion"}


def _translate(args: Dict, keymap: Dict[str, str], ignored: set) -> Dict:
    out = {}
    for k, v in args.items():
        if k in ignored:
            continue
        if k in keymap:
            out[keymap[k]] = v
        else:
            out[k] = v  # already snake_case
    if "channels" in out and out["channels"] is not None:
        out["channels"] = tuple(out["channels"])
    if out.pop("_fast_variants", False):
        out.setdefault("fast_recon", True)
        out.setdefault("fast_detail", True)
        out.setdefault("fast_control", True)
        out.setdefault("fast_mod", True)  # self-gates to TPU backends
    # frozen_ex passes through as a module field for introspection; the
    # actual freezing is an optimizer concern (optim.subtree_freeze_labels,
    # wired in train/cli.py from the same key).
    return out


def build_model(model_cfg: Dict):
    """model_cfg: {'name': ..., 'args': {...}} (either naming convention)."""
    name = model_cfg["name"]
    args = model_cfg.get("args", {}) or {}
    if name == "EVFIAutoEx":
        return EVFIAutoEx(**_translate(args, _EVFI_KEYMAP, _EVFI_IGNORED))
    if name == "ExposureDecision":
        return ExposureDecision(**_translate(args, _EXPOSURE_KEYMAP, _EXPOSURE_IGNORED))
    raise ValueError(f"Unknown model {name!r}")
