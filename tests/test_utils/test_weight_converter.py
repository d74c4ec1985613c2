"""Torch->flax weight-converter parity (SURVEY.md §5.4: converter enables
parity testing against reference checkpoints)."""

import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..',
                            'tools', 'model_converters'))

torch = pytest.importorskip('torch')


def _mini_resnet():
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        def __init__(self, cin, planes, stride=1, ds=False):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1,
                                    bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU()
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4)) if ds else None

        def forward(self, x):
            idt = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(out + idt)

    class MiniResNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(
                Bottleneck(64, 64, 1, True), Bottleneck(256, 64),
                Bottleneck(256, 64))

        def forward(self, x):
            return self.layer1(self.maxpool(self.relu(self.bn1(
                self.conv1(x)))))

    return MiniResNet()


def test_resnet_conversion_numerical_parity():
    import jax
    import jax.numpy as jnp
    from convert_torch_weights import torch_resnet_to_flax
    from orientedobjectdetection_tpu.models import ResNet

    torch.manual_seed(0)
    net = _mini_resnet().eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        y_t = net(x).numpy()

    state = {f'backbone.{k}': v.numpy()
             for k, v in net.state_dict().items()}
    params, stats = torch_resnet_to_flax(state)

    bb = ResNet(depth=50, num_stages=1, out_indices=(0,))
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    with jax.default_matmul_precision('highest'):
        y_j = bb.apply({'params': params, 'batch_stats': stats}, xj)[0]
    y_j = np.transpose(np.asarray(y_j), (0, 3, 1, 2))
    np.testing.assert_allclose(y_j, y_t, atol=1e-4)
