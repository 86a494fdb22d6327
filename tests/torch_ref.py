"""Import helper for the reference PyTorch models (golden-parity oracle).

The reference scripts at /root/reference/Backend import torchvision/skimage/
diffusers at module level although the *model classes* never use them at
construction or forward time. Those packages are absent in this image, so we
install minimal import-time stubs before importing the reference modules.

Reference code is used read-only, as a numerical oracle in tests — the
framework itself shares no code with it.
"""

import sys
import types

REF = "/root/reference/Backend"


def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install_stubs():
    if "torchvision" in sys.modules and not isinstance(
        sys.modules["torchvision"], types.ModuleType
    ):
        return
    tv = _stub("torchvision")
    transforms = _stub("torchvision.transforms")

    class _Missing:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision stub: not usable at runtime")

    class _InterpolationMode:
        BICUBIC = "bicubic"

    transforms.Compose = _Missing
    transforms.Resize = _Missing
    transforms.ToTensor = _Missing
    transforms.Normalize = _Missing
    transforms.InterpolationMode = _InterpolationMode
    transforms.functional = _stub("torchvision.transforms.functional")
    tv.transforms = transforms
    tv.models = _stub("torchvision.models")

    from tests import skimage_oracle

    sk = _stub("skimage")
    metrics = _stub(
        "skimage.metrics",
        peak_signal_noise_ratio=skimage_oracle.peak_signal_noise_ratio,
        structural_similarity=skimage_oracle.structural_similarity,
    )
    sk.metrics = metrics

    _stub("diffusers", DDPMScheduler=None, DPMSolverMultistepScheduler=None)

    if REF not in sys.path:
        sys.path.insert(0, REF)


def load_reference():
    """Import and return the reference model modules (CPU torch)."""
    install_stubs()
    import importlib.util

    mods = {}
    for name, path in [
        ("ddim", f"{REF}/DDIM/DDIMModel.py"),
        ("nafnet", f"{REF}/NafNet/NafnetModel.py"),
        ("direct", f"{REF}/DirectUNet/DirectUNetModel.py"),
        ("hybrid", f"{REF}/hybrid/hybrid3diffusionspeed.py"),
        ("cddpm", f"{REF}/cddpm/cddpmModels.py"),
        ("tiny", f"{REF}/newfastmodel/modelfunctions.py"),
        ("model2", f"{REF}/model2.py"),
    ]:
        key = f"_ref_{name}"
        if key in sys.modules:
            mods[name] = sys.modules[key]
            continue
        spec = importlib.util.spec_from_file_location(key, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[key] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods
