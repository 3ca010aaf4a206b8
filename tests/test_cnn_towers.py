"""Golden parity for the CNN towers vs compact torch.nn references.

torchvision isn't installed here, so the tests build the same graphs from
torch.nn primitives (the layers torchvision composes), load the SAME random
state_dict through our converters, and require matching features.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from plip_tpu.models import densenet as jdense  # noqa: E402
from plip_tpu.models import resnet as jres  # noqa: E402


# --- compact torch ResNet (torchvision graph & naming) ----------------------


class BasicBlock(nn.Module):
    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU()
        if stride != 1 or cin != width:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width, 1, stride, bias=False), nn.BatchNorm2d(width)
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class TorchResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        layers = []
        cin, width = 64, 64
        for li, n in enumerate([2, 2, 2, 2]):
            blocks = []
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                blocks.append(BasicBlock(cin, width, stride))
                cin = width
            layers.append(nn.Sequential(*blocks))
            width *= 2
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        y = self.layer4(self.layer3(self.layer2(self.layer1(y))))
        return y.mean(dim=(2, 3))


def test_resnet18_parity():
    torch.manual_seed(0)
    model = TorchResNet18().eval()
    # perturb BN running stats so inference-mode BN is actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.6)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)
    params = jres.from_torch_state_dict(model.state_dict(), "resnet18")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours, _ = jres.forward_features(params, jnp.asarray(x), "resnet18")
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


# --- compact torch DenseNet (torchvision graph & naming) --------------------


class TorchDenseNetTiny(nn.Module):
    """DenseNet with blocks [2, 2], growth 8, init 16 — same topology family
    as densenet121, sized for fast tests. State_dict uses torchvision naming
    via explicit module registration."""

    def __init__(self):
        super().__init__()
        g, c = 8, 16
        self.conv0 = nn.Conv2d(3, c, 7, 2, 3, bias=False)
        self.norm0 = nn.BatchNorm2d(c)
        self.blocks = [2, 2]
        for bi, n in enumerate(self.blocks):
            block = nn.Module()
            for li in range(n):
                layer = nn.Module()
                layer.norm1 = nn.BatchNorm2d(c)
                layer.conv1 = nn.Conv2d(c, 4 * g, 1, bias=False)
                layer.norm2 = nn.BatchNorm2d(4 * g)
                layer.conv2 = nn.Conv2d(4 * g, g, 3, 1, 1, bias=False)
                setattr(block, f"denselayer{li+1}", layer)
                c += g
            setattr(self, f"denseblock{bi+1}", block)
            if bi < len(self.blocks) - 1:
                tr = nn.Module()
                tr.norm = nn.BatchNorm2d(c)
                tr.conv = nn.Conv2d(c, c // 2, 1, bias=False)
                setattr(self, f"transition{bi+1}", tr)
                c //= 2
        self.norm5 = nn.BatchNorm2d(c)

    def forward(self, x):
        import torch.nn.functional as F

        y = F.max_pool2d(F.relu(self.norm0(self.conv0(x))), 3, 2, 1)
        for bi, n in enumerate(self.blocks):
            block = getattr(self, f"denseblock{bi+1}")
            for li in range(n):
                layer = getattr(block, f"denselayer{li+1}")
                z = layer.conv1(F.relu(layer.norm1(y)))
                z = layer.conv2(F.relu(layer.norm2(z)))
                y = torch.cat([y, z], dim=1)
            if bi < len(self.blocks) - 1:
                tr = getattr(self, f"transition{bi+1}")
                y = F.avg_pool2d(tr.conv(F.relu(tr.norm(y))), 2, 2)
        y = F.relu(self.norm5(y))
        return y.mean(dim=(2, 3))


def test_densenet_parity():
    torch.manual_seed(1)
    model = TorchDenseNetTiny().eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.6)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)
    # our side: register a matching tiny arch
    jdense.ARCHS["densenet_tiny"] = {"growth": 8, "blocks": [2, 2], "init_feats": 16}
    params = jdense.from_torch_state_dict(model.state_dict(), "densenet_tiny")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours, _ = jdense.forward_features(params, jnp.asarray(x), "densenet_tiny")
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def test_densenet121_feature_dim():
    assert jdense.n_features("densenet121") == 1024
    assert jres.n_features("resnet50") == 2048
    assert jres.n_features("resnet18") == 512


def test_resnet_train_mode_updates_stats():
    params = jres.init_params(jax.random.PRNGKey(0), "resnet18")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
    _, stats = jres.forward_features(params, x, "resnet18", training=True)
    assert not np.allclose(np.asarray(stats["bn1"]["mean"]), 0.0)
