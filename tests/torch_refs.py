"""Torch re-statements of the reference networks for parity testing.

These mirror the *semantics* of the reference modules
(``src/models/resnetfc.py``, ``src/models/positional_encoding.py``,
torchvision's resnet BasicBlock stack as used by
``src/models/image_encoder.py``) using only torch core, so tests can verify
the flax implementations + weight converters numerically. Test-only code.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchPositionalEncoding(nn.Module):
    def __init__(self, num_freqs=6, d_in=3, freq_factor=math.pi,
                 include_input=True):
        super().__init__()
        self.num_freqs = num_freqs
        self.d_in = d_in
        self.include_input = include_input
        freqs = freq_factor * 2.0 ** torch.arange(0, num_freqs)
        self.d_out = num_freqs * 2 * d_in + (d_in if include_input else 0)
        self.register_buffer("_freqs",
                             torch.repeat_interleave(freqs, 2).view(1, -1, 1))
        phases = torch.zeros(2 * num_freqs)
        phases[1::2] = math.pi * 0.5
        self.register_buffer("_phases", phases.view(1, -1, 1))

    def forward(self, x):
        shape = x.shape
        x = x.reshape(-1, shape[-1])
        emb = x.unsqueeze(1).repeat(1, self.num_freqs * 2, 1)
        emb = torch.sin(torch.addcmul(self._phases, emb, self._freqs))
        emb = emb.view(x.shape[0], -1)
        if self.include_input:
            emb = torch.cat((x, emb), dim=-1)
        return emb.reshape(*shape[:-1], self.d_out)


class TorchResnetBlockFC(nn.Module):
    def __init__(self, size_in, size_out=None, size_h=None):
        super().__init__()
        size_out = size_out or size_in
        size_h = size_h or min(size_in, size_out)
        self.fc_0 = nn.Linear(size_in, size_h)
        self.fc_1 = nn.Linear(size_h, size_out)
        nn.init.zeros_(self.fc_1.weight)
        self.shortcut = (None if size_in == size_out
                         else nn.Linear(size_in, size_out, bias=False))

    def forward(self, x):
        net = self.fc_0(torch.relu(x))
        dx = self.fc_1(torch.relu(net))
        xs = x if self.shortcut is None else self.shortcut(x)
        return xs + dx


class TorchResnetFC(nn.Module):
    def __init__(self, d_in, d_out=4, n_blocks=5, d_latent=0, d_hidden=128,
                 combine_layer=1000):
        super().__init__()
        self.d_latent, self.d_in = d_latent, d_in
        self.combine_layer = combine_layer
        self.n_blocks = n_blocks
        self.lin_in = nn.Linear(d_in, d_hidden)
        self.lin_out = nn.Linear(d_hidden, d_out)
        self.blocks = nn.ModuleList(
            [TorchResnetBlockFC(d_hidden) for _ in range(n_blocks)])
        if d_latent:
            self.lin_z = nn.ModuleList(
                [nn.Linear(d_latent, d_hidden)
                 for _ in range(min(combine_layer, n_blocks))])

    def forward(self, zx, combine_dim=1):
        z = zx[..., : self.d_latent]
        x = zx[..., self.d_latent:]
        x = self.lin_in(x)
        for i, blk in enumerate(self.blocks):
            if i == self.combine_layer:
                x = torch.mean(x, dim=combine_dim)
            if self.d_latent > 0 and i < self.combine_layer:
                x = x + self.lin_z[i](z)
            x = blk(x)
        return self.lin_out(torch.relu(x))


class TorchBasicBlock(nn.Module):
    def __init__(self, c_in, width, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, width, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        if stride != 1 or c_in != width:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, width, 1, stride, bias=False),
                nn.BatchNorm2d(width))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(idt + y)


class TorchResNetPyramid(nn.Module):
    """torchvision-resnet-compatible pyramid (state_dict names match)."""

    def __init__(self, c_in=3, blocks=(3, 4, 6, 3), num_layers=4,
                 use_first_pool=True):
        super().__init__()
        self.num_layers = num_layers
        self.use_first_pool = use_first_pool
        self.conv1 = nn.Conv2d(c_in, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        c = 64
        for s in range(4):
            if num_layers <= s + 1:
                break
            layers = []
            for b in range(blocks[s]):
                stride = 2 if (s > 0 and b == 0) else 1
                layers.append(TorchBasicBlock(c, widths[s], stride))
                c = widths[s]
            setattr(self, f"layer{s + 1}", nn.Sequential(*layers))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        latents = [x]
        for s in range(4):
            if self.num_layers <= s + 1:
                break
            if s == 0 and self.use_first_pool:
                x = self.maxpool(x)
            x = getattr(self, f"layer{s + 1}")(x)
            latents.append(x)
        return latents


class TorchSpatialEncoder(nn.Module):
    """Reference SpatialEncoder semantics: pad + PE ring + pyramid concat."""

    def __init__(self, image_padding=8, padding_pe=4, num_layers=4,
                 blocks=(3, 4, 6, 3)):
        super().__init__()
        self.image_padding = image_padding
        self.padding_pe = padding_pe
        self.pe = TorchPositionalEncoding(padding_pe, 2, math.pi, True)
        c_in = 3 + (self.pe.d_out if padding_pe >= 0 and image_padding else 0)
        self.model = TorchResNetPyramid(c_in, blocks, num_layers)

    def forward(self, imgs):
        N = imgs.shape[0]
        p = self.image_padding
        H, W = imgs.shape[-2:]
        imgs = F.pad(imgs, [p] * 4, mode="replicate")
        if self.padding_pe >= 0 and p > 0:
            grid = torch.stack(
                torch.meshgrid(torch.linspace(-1, 1, H + 2 * p),
                               torch.linspace(-1, 1, W + 2 * p),
                               indexing="ij")[::-1], dim=-1)
            pe_in = self.pe(grid)
            pe_in[p:-p, p:-p] = 0
            imgs = torch.cat(
                (imgs, pe_in.permute(2, 0, 1).unsqueeze(0).expand(N, -1, -1, -1)),
                dim=1)
        latents = self.model(imgs)
        sz = latents[0].shape[-2:]
        latents = [F.interpolate(t, sz, mode="bilinear", align_corners=True)
                   for t in latents]
        return torch.cat(latents, dim=1)


def state_dict_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}
