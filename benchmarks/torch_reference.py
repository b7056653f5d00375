"""Torch-CPU reference-equivalent measurement harness (benchmark only).

Recreates the reference pipeline's per-epoch costs so bench.py can report an
honest vs_baseline ratio on this machine: (a) the per-sample host preprocess
(min-max normalize + scipy zoom order=1, reference
partial_modality_training.py:94-109, re-done EVERY epoch), and (b) a
torch fwd+bwd+Adam step of an architecture-equivalent gated multimodal net
(DenseNet121-3D CT encoder as MONAI builds it + RNA/clinical MLPs + gate +
Cox loss). This file is measurement harness, not framework code — the
framework itself contains no torch.
"""

from __future__ import annotations

import time

import numpy as np


def measure_host_preprocess(vol_shape=(160, 512, 512), out=(64, 64, 32),
                            iters=3) -> float:
    """Seconds per volume for the reference's host-side normalize+zoom."""
    from scipy import ndimage

    rng = np.random.default_rng(0)
    vol = rng.normal(size=vol_shape).astype(np.float32)
    factors = [o / i for i, o in zip(vol_shape, out)]
    # warmup
    ndimage.zoom((vol - vol.min()) / (vol.max() - vol.min() + 1e-8),
                 factors, order=1)
    t0 = time.perf_counter()
    for _ in range(iters):
        v = (vol - vol.min()) / (vol.max() - vol.min() + 1e-8)
        ndimage.zoom(v, factors, order=1)
    return (time.perf_counter() - t0) / iters


def _densenet121_3d(out_features=128):
    import torch.nn as nn

    class DenseLayer(nn.Module):
        def __init__(self, in_ch, growth, bn_size):
            super().__init__()
            self.net = nn.Sequential(
                nn.BatchNorm3d(in_ch), nn.ReLU(),
                nn.Conv3d(in_ch, bn_size * growth, 1, bias=False),
                nn.BatchNorm3d(bn_size * growth), nn.ReLU(),
                nn.Conv3d(bn_size * growth, growth, 3, padding=1, bias=False),
            )

        def forward(self, x):
            import torch

            return torch.cat([x, self.net(x)], 1)

    def transition(in_ch, out_ch):
        return nn.Sequential(
            nn.BatchNorm3d(in_ch), nn.ReLU(),
            nn.Conv3d(in_ch, out_ch, 1, bias=False), nn.AvgPool3d(2),
        )

    layers = [
        nn.Conv3d(1, 64, 7, stride=2, padding=3, bias=False),
        nn.BatchNorm3d(64), nn.ReLU(),
        nn.MaxPool3d(3, stride=2, padding=1),
    ]
    ch = 64
    for bi, n in enumerate((6, 12, 24, 16)):
        for _ in range(n):
            layers.append(DenseLayer(ch, 32, 4))
            ch += 32
        if bi != 3:
            layers.append(transition(ch, ch // 2))
            ch //= 2
    layers += [nn.BatchNorm3d(ch), nn.ReLU(),
               nn.AdaptiveAvgPool3d(1), nn.Flatten(),
               nn.Linear(ch, out_features)]
    net = nn.Sequential(*layers)
    # MONAI's constructor ALWAYS applies this init; the reference runs MONAI
    # (see torch_reference_named._apply_monai_densenet_init docstring).
    from .torch_reference_named import _apply_monai_densenet_init

    _apply_monai_densenet_init(net)
    return net


def build_torch_gated_net(rna_dim=5005):
    import torch
    import torch.nn as nn

    class GatedNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.ct = _densenet121_3d(128)
            self.rna = nn.Sequential(
                nn.Linear(rna_dim, 512), nn.BatchNorm1d(512), nn.ReLU(),
                nn.Dropout(0.3), nn.Linear(512, 128), nn.ReLU())
            self.clin = nn.Sequential(nn.Linear(1, 32), nn.ReLU())
            self.gate = nn.Sequential(nn.Linear(288 + 3, 64), nn.ReLU(),
                                      nn.Linear(64, 3), nn.Softmax(dim=1))
            self.fusion = nn.Sequential(
                nn.Linear(288, 256), nn.BatchNorm1d(256), nn.ReLU(),
                nn.Dropout(0.3), nn.Linear(256, 128), nn.ReLU())
            self.head = nn.Linear(128, 1)

        def forward(self, ct, rna, clin, mask):
            f = [self.ct(ct) * mask[:, 0:1], self.rna(rna) * mask[:, 1:2],
                 self.clin(clin) * mask[:, 2:3]]
            cat = torch.cat(f + [mask], 1)
            g = self.gate(cat)
            fused = torch.cat([f[0] * g[:, 0:1], f[1] * g[:, 1:2],
                               f[2] * g[:, 2:3]], 1)
            return self.head(self.fusion(fused)).squeeze(1), g

    return GatedNet()


def measure_torch_train_step(batch=8, image_shape=(64, 64, 32),
                             rna_dim=5005, timed_steps=1) -> float:
    """Seconds per fwd+Cox-loss+bwd+Adam step of the torch equivalent."""
    import torch

    torch.manual_seed(0)
    model = build_torch_gated_net(rna_dim)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=1e-4)
    ct = torch.randn(batch, 1, *image_shape)
    rna = torch.randn(batch, rna_dim)
    clin = torch.rand(batch, 1)
    mask = (torch.rand(batch, 3) < 0.8).float()
    time_t = torch.rand(batch) * 1000
    event = (torch.rand(batch) < 0.6).float()

    def cox(h):
        order = torch.argsort(time_t, descending=True)
        hs, es = h[order], event[order]
        return -torch.sum((hs - torch.logcumsumexp(hs, 0)) * es) / (
            es.sum() + 1e-8)

    def step():
        opt.zero_grad()
        h, g = model(ct, rna, clin, mask)
        loss = cox(h) - 0.01 * (-(g * (g + 1e-8).log()).sum(1)).mean()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(timed_steps):
        step()
    return (time.perf_counter() - t0) / timed_steps
