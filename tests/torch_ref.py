"""Minimal PyTorch oracles for conversion-parity tests.

Independent re-statements of standard public architectures (He et al. 2016
ResNet; NetVLAD pooling) used ONLY as numerical test oracles for the
torch -> flax converter.  Written against torch.nn directly (torchvision is
not installed in this environment); state-dict key names follow the
torchvision conventions the converter expects.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class TorchResNet(nn.Module):
    """torchvision-compatible state-dict naming (conv1, bn1, layerN.M...)."""

    def __init__(self, stage_sizes=(3, 4, 6, 3), feat_dim=64):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cin = 64
        for s, blocks in enumerate(stage_sizes):
            cout = 64 * 2 ** s
            layer = []
            for b in range(blocks):
                layer.append(TorchBasicBlock(cin, cout,
                                             2 if s > 0 and b == 0 else 1))
                cin = cout
            setattr(self, f"layer{s + 1}", nn.Sequential(*layer))
        self.fc = nn.Linear(cin, feat_dim)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.fc(x)


class TorchNetVLADPool(nn.Module):
    """NetVLAD pooling oracle with torch state-dict naming
    (conv, centroids)."""

    def __init__(self, clusters=8, dim=16):
        super().__init__()
        self.conv = nn.Conv2d(dim, clusters, 1, bias=False)
        self.centroids = nn.Parameter(torch.rand(clusters, dim))
        self.clusters, self.dim = clusters, dim

    def forward(self, x):  # x: [N, C, H, W]
        n, c = x.shape[:2]
        x = F.normalize(x, p=2, dim=1)
        a = F.softmax(self.conv(x).view(n, self.clusters, -1), dim=1)
        xf = x.view(n, c, -1)
        vlad = torch.einsum("nkp,ncp->nkc", a, xf) \
            - a.sum(-1)[..., None] * self.centroids[None]
        vlad = F.normalize(vlad, p=2, dim=2).view(n, -1)
        return F.normalize(vlad, p=2, dim=1)
