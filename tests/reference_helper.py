"""Import the torch reference's model modules for golden parity tests.

The reference package __init__ drags in torchvision/zarr (absent here), so we
register a bare ``yogo`` package pointing at the reference source tree and
import only the submodules we need (yogo.model / yogo.model_defns import
nothing but torch). Used strictly to *generate expected values* - no
reference code is copied.
"""

import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    if not (REFERENCE / "yogo" / "model.py").exists():
        return False
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


def import_reference_model():
    """Returns (yogo.model, yogo.model_defns) modules from the reference."""
    if "yogo" not in sys.modules or not getattr(
        sys.modules["yogo"], "_yogo_tpu_stub", False
    ):
        pkg = types.ModuleType("yogo")
        pkg.__path__ = [str(REFERENCE / "yogo")]
        pkg._yogo_tpu_stub = True
        sys.modules["yogo"] = pkg
    import yogo.model
    import yogo.model_defns

    return yogo.model, yogo.model_defns
