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


class TorchSimpleConvEdgeUpt(nn.Module):
    """Reference-semantics GNN layer on sparse edge lists (state-dict names
    match convert._gnn_layer expectations: mlp, mlp_updating,
    edge_model.edge_mlp, att)."""

    def __init__(self, dim):
        super().__init__()
        self.mlp = nn.Sequential(nn.Linear(2 * dim, dim), nn.ReLU(),
                                 nn.Linear(dim, dim))
        self.mlp_updating = nn.Sequential(nn.Linear(2 * dim, dim),
                                          nn.ReLU(), nn.Linear(dim, dim))

        class EdgeModel(nn.Module):
            def __init__(self):
                super().__init__()
                self.edge_mlp = nn.Sequential(
                    nn.Linear(3 * dim, dim), nn.ReLU(),
                    nn.Linear(dim, dim))

        self.edge_model = EdgeModel()

        class Att(nn.Module):
            def __init__(self):
                super().__init__()
                self.g = nn.Linear(dim, dim // 8)
                self.theta = nn.Linear(dim, dim // 8)
                self.phi = nn.Linear(dim, dim // 8)
                self.W = nn.Linear(dim // 8, dim)

            def forward(self, x):
                # true reference math (att.py:20-33): f = phi @ theta^T is a
                # [*, C/8, C/8] outer product, softmax over the LAST axis
                # mixes g(x) across bottleneck channels
                g_x = self.g(x).unsqueeze(-1)            # [*, c8, 1]
                theta_x = self.theta(x).unsqueeze(-2)    # [*, 1, c8]
                phi_x = self.phi(x).unsqueeze(-1)        # [*, c8, 1]
                f = torch.matmul(phi_x, theta_x)         # [*, c8, c8]
                w = F.softmax(f, dim=-1)
                y = torch.matmul(w, g_x).squeeze(-1)     # [*, c8]
                return x + self.W(y)

        self.att = Att()

    def forward(self, x, edge_index, e):
        src, dst = edge_index[0], edge_index[1]
        e_new = self.edge_model.edge_mlp(
            torch.cat([x[src], x[dst], e], dim=1))
        # message: x_j = source features (PyG source_to_target flow)
        msg = self.att(self.mlp(torch.cat([x[src], e_new], dim=1)))
        # scatter-mean at targets
        n = x.shape[0]
        aggr = torch.zeros(n, msg.shape[1])
        cnt = torch.zeros(n, 1)
        aggr.index_add_(0, dst, msg)
        cnt.index_add_(0, dst, torch.ones(len(dst), 1))
        aggr = aggr / cnt.clamp(min=1.0)
        x_new = self.mlp_updating(torch.cat([x, aggr], dim=1))
        return x_new, e_new


def torch_knn_edge_index(x: "torch.Tensor", k: int) -> "torch.Tensor":
    """Restatement of `torch_cluster.knn_graph(x, k, loop=False)` semantics
    (the dynamic-graph override at reference posenet.py:1043-1050): for each
    center node i, edges (j, i) from its k nearest neighbors j (L2, self
    excluded), neighbors listed in ascending distance per center — so the
    FIRST edge into node 0 is its nearest neighbor (testing/test.py:227-229
    anchor-selection contract)."""
    d = torch.cdist(x.double(), x.double())
    d.fill_diagonal_(float("inf"))
    nbr = d.topk(k, largest=False).indices            # [N, k] ascending
    n = x.shape[0]
    col = torch.arange(n).repeat_interleave(k)        # centers/targets
    row = nbr.reshape(-1)                             # sources
    return torch.stack([row, col])


class TorchRelPoseGNN(nn.Module):
    """Full reference-semantics model (PoseNetX_R2: static fc graph or
    dynamic kNN override when knn > 0, weight-tied gnn1 applied `recursion`
    times), torchvision-style state-dict names for
    convert.convert_relpose_gnn."""

    def __init__(self, dim=32, stage_sizes=(2, 2, 2, 2), recursion=2,
                 knn=0):
        super().__init__()
        self.feature_extractor = TorchResNet(stage_sizes, feat_dim=dim)
        self.proj_edge = nn.Linear(2 * dim, dim)
        self.gnn1 = TorchSimpleConvEdgeUpt(dim)
        self.fc_xyz = nn.Linear(dim, 3)
        self.fc_wpqr = nn.Linear(dim, 3)
        self.fc_xyz_R = nn.Linear(dim, 3)
        self.fc_wpqr_R = nn.Linear(dim, 3)
        self.recursion = recursion
        self.knn = knn

    def forward(self, images_nchw, edge_index):
        x = self.feature_extractor(images_nchw)
        if self.knn > 0:  # dynamic kNN graph overrides the stored structure
            edge_index = torch_knn_edge_index(x, self.knn)
        lo = torch.minimum(edge_index[0], edge_index[1])
        hi = torch.maximum(edge_index[0], edge_index[1])
        e = torch.cat([x[lo], x[hi]], dim=1)
        e = F.relu(self.proj_edge(e))
        for _ in range(self.recursion):
            x, e = self.gnn1(x, edge_index, e)
            x = F.relu(x)
            e = F.relu(e)
        pred = torch.cat([self.fc_xyz(x), self.fc_wpqr(x)], dim=1)
        pred_r = torch.cat([self.fc_xyz_R(e), self.fc_wpqr_R(e)], dim=1)
        return pred, pred_r, edge_index


class TorchMiniViT(nn.Module):
    """timm/DINOv2-layout ViT oracle for convert.convert_vit: fused-qkv
    attention, pre-norm blocks, optional LayerScale gammas.  State-dict
    names follow timm's vision_transformer.py conventions (cls_token,
    pos_embed, patch_embed.proj, blocks.N.{norm1,attn.qkv,attn.proj,
    norm2,mlp.fc1,mlp.fc2[,ls1,ls2]}, norm).  Math matches
    models/vit.py::ViTEncoder exactly: LayerNorm eps 1e-6 (flax default;
    torch's default is 1e-5) and tanh-approximate GELU (jax.nn.gelu
    default), so parity tests can assert tightly.  forward returns the
    post-norm CLS token — the flax model's from-scratch `fc` head has no
    torch counterpart."""

    class _Block(nn.Module):
        def __init__(self, dim, heads, layer_scale):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim, eps=1e-6)
            self.norm2 = nn.LayerNorm(dim, eps=1e-6)

            class Attn(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.qkv = nn.Linear(dim, 3 * dim)
                    self.proj = nn.Linear(dim, dim)

            class Mlp(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.fc1 = nn.Linear(dim, 4 * dim)
                    self.fc2 = nn.Linear(4 * dim, dim)

            self.attn, self.mlp = Attn(), Mlp()
            self.heads = heads
            if layer_scale:

                class LS(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.gamma = nn.Parameter(torch.ones(dim))

                self.ls1, self.ls2 = LS(), LS()
            else:
                self.ls1 = self.ls2 = None

        def forward(self, x):
            n, t, d = x.shape
            h, dh = self.heads, d // self.heads
            qkv = self.attn.qkv(self.norm1(x))
            q, k, v = qkv.reshape(n, t, 3, h, dh).permute(2, 0, 3, 1, 4)
            att = torch.softmax(q @ k.transpose(-2, -1) / dh ** 0.5, -1)
            y = (att @ v).transpose(1, 2).reshape(n, t, d)
            y = self.attn.proj(y)
            if self.ls1 is not None:
                y = y * self.ls1.gamma
            x = x + y
            y = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x)),
                                    approximate="tanh"))
            if self.ls2 is not None:
                y = y * self.ls2.gamma
            return x + y

    def __init__(self, dim=32, depth=2, heads=4, patch=8, grid=(2, 3),
                 layer_scale=False):
        super().__init__()
        n_tok = grid[0] * grid[1] + 1
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, n_tok, dim))

        class PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(3, dim, patch, patch)

        self.patch_embed = PatchEmbed()
        self.blocks = nn.Sequential(*[
            self._Block(dim, heads, layer_scale) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):  # [N, 3, H, W] -> [N, D] post-norm CLS
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], 1)
        x = x + self.pos_embed
        x = self.blocks(x)
        return self.norm(x)[:, 0]
