"""Torch checkpoint import: forward parity between torch and flax.

Builds torch models with the reference/torchvision naming, imports their
state_dicts into the flax models, and asserts the two frameworks compute the
same outputs — validating both the key mapping and our NHWC/padding
geometry claims.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from dmcnet_tpu.models import make_estimator, resnet18  # noqa: E402
from dmcnet_tpu.models.import_torch import (  # noqa: E402
    import_state_dict,
    merge_variables,
)


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
    def __init__(self, num_classes=51, in_ch=2):
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
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


class TorchDenseTiny(tnn.Module):
    def __init__(self, ch_in=5):
        super().__init__()
        widths = [8, 8, 6, 4, 2]
        cin = ch_in
        for i, w in enumerate(widths):
            setattr(self, f"conv_{i}", tnn.Sequential(
                tnn.Conv2d(cin, w, 3, 1, 1), tnn.LeakyReLU(0.1)))
            cin += w
        self.predict_flow = tnn.Conv2d(cin, 2, 3, 1, 1)

    def forward(self, x):
        for i in range(5):
            y = getattr(self, f"conv_{i}")(x)
            x = torch.cat((y, x), 1)
        return self.predict_flow(x)


def _randomize_bn_stats(model):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)


@torch.no_grad()
def test_resnet18_forward_parity():
    tmodel = TorchResNet18(num_classes=11, in_ch=2).eval()
    _randomize_bn_stats(tmodel)
    sd = {"base_model." + k: v for k, v in tmodel.state_dict().items()}
    imported, skipped = import_state_dict(sd)
    assert not skipped

    jmodel = resnet18(num_classes=11)
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 2)).astype(np.float32)
    variables = jmodel.init(jax.random.key(0), x, train=False)
    merged = {
        "params": imported["params"]["base_model"],
        "batch_stats": imported["batch_stats"]["base_model"],
    }
    merged, missing = merge_variables(variables, merged)
    assert not missing

    jout = np.asarray(jmodel.apply(merged, x, train=False))
    tout = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(jout, tout, atol=2e-4)


@torch.no_grad()
def test_dense_tiny_forward_parity():
    tmodel = TorchDenseTiny().eval()
    sd = {"gen_flow_model." + k: v for k, v in tmodel.state_dict().items()}
    imported, skipped = import_state_dict(sd)
    assert not skipped

    jmodel = make_estimator("DenseNetTiny")
    x = np.random.default_rng(1).normal(size=(2, 32, 32, 5)).astype(np.float32)
    variables = jmodel.init(jax.random.key(0), x)
    merged = {"params": imported["params"]["gen_flow_model"]}
    merged, missing = merge_variables(variables, merged)
    assert not missing

    jout = np.asarray(jmodel.apply(merged, x))
    tout = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(jout, tout.transpose(0, 2, 3, 1), atol=1e-4)
