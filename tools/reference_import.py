"""Shared loader for the ACTUAL reference implementation (parity evidence).

Several parity surfaces (tests/test_reference_parity.py,
tests/test_training_parity_torch.py, tools/verify_winner_export.py) import
the authoritative ``/root/reference/src`` modules — torch-only code — to
check our numerics against the real thing rather than hand-written
replicas. This module is the single copy of that import dance so the
reference location and the torchvision stubbing live in one place.

The reference root can be overridden with ``FOOD101_SR_REFERENCE`` (e.g.
pointing at a checkout elsewhere); modules are cached in sys.modules under
stable names so repeated loads share one module object.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import types

REFERENCE_ROOT = os.environ.get("FOOD101_SR_REFERENCE", "/root/reference")


def load_reference_module(rel_path: str, name: str):
    if name in sys.modules:
        return sys.modules[name]
    path = os.path.join(REFERENCE_ROOT, rel_path)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_models():
    """The reference's model definitions (reference src/models.py:80-227);
    depends only on core torch."""
    return load_reference_module("src/models.py", "food101_ref_models")


def load_reference_losses():
    """The reference's loss module (reference src/loss.py). It does
    ``from torchvision.models import vgg19`` at module top and torchvision
    is absent in this image; NLPDLoss/TVLoss never touch it, so a stub lets
    the REAL module import (PerceptualLoss would only fail if
    instantiated)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.vgg19 = None
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    return load_reference_module("src/loss.py", "food101_ref_loss")
