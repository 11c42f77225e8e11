"""Shared helpers for A/B tests against the REAL reference torch code.

Imports the reference model files from /root/reference with their heavy,
unavailable deps (cv2, torchvision) stubbed.  torchvision is absent in this
environment, so `torchvision.models.resnet18` is backed by a local,
torchvision-graph-and-naming-exact ResNet-18 (same module/key layout the
import machinery maps, models/import_torch.py:75-97); the reference's
`_prepare_tsn` then swaps conv1/fc exactly as it would on the real one
(code/dmcnet/model.py:283-299).
"""

import sys
import types

import torch
import torch.nn as tnn


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU()
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class TorchResNet18(tnn.Module):
    """torchvision.models.resnet18 twin (naming-exact)."""

    def __init__(self, num_classes=1000, in_ch=3):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        cin = 64
        for li, w in enumerate(widths, start=1):
            stride = 1 if li == 1 else 2
            setattr(self, f"layer{li}", tnn.Sequential(
                TorchBasicBlock(cin, w, stride), TorchBasicBlock(w, w, 1)))
            cin = w
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def load_ref_module(subdir, name="model"):
    """Import `<subdir>/<name>.py` from the reference tree with cv2 /
    torchvision / transforms stubbed.  `torchvision.models.resnet18` maps to
    the local twin above (pretrained flag accepted and ignored — no network
    in this environment; weights get overwritten by the A/B sync anyway)."""
    ref_dir = f"/root/reference/code/{subdir}"
    sys.modules.setdefault("cv2", types.ModuleType("cv2"))
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.resnet18 = lambda pretrained=False, **kw: TorchResNet18()
    tv.models = tv_models
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.transforms.Compose = lambda *a, **k: None
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    stub = types.ModuleType("transforms")
    stub.GroupMultiScaleCrop = object
    stub.GroupRandomHorizontalFlip = object
    sys.modules["transforms"] = stub
    sys.path.insert(0, ref_dir)
    try:
        import importlib
        if name in sys.modules:  # a different subdir's model.py may be cached
            del sys.modules[name]
        mod = importlib.import_module(name)
    finally:
        sys.path.pop(0)
        sys.modules.pop("transforms", None)
    return mod


def torch_state_to_flax(model):
    """Current torch state_dict -> flax {params, batch_stats} trees via the
    production importer (so the comparison exercises the real mapping)."""
    from dmcnet_tpu.models.import_torch import import_state_dict

    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    imported, _ = import_state_dict(sd)
    return imported
