"""CPU reference baseline: SNGAN CIFAR-10 fused-equivalent train iteration in
PyTorch (CPU, eager) — the stand-in for the reference's TF1-on-CPU number
(BASELINE.md north-star: >=5x images/sec/chip over TF1-on-CPU).

Why torch-CPU: the reference is TF1 running eager-ish graph ops on CPU; torch
CPU eager has the same op-by-op execution profile and mature CPU kernels,
making it a *favorable-to-the-baseline* proxy. (XLA-CPU was tried first but
takes >90 min to compile the fused graph on this 1-core host.)

Same architecture and schedule as the JAX/TPU path: ResNet G (256ch, 3
up-blocks) / SN-ResNet D (128ch), hinge loss, Adam(2e-4, 0, 0.9), n_critic=5,
batch 64. Writes baselines_cpu.json at the repo root.

Run: python baselines/torch_sngan_cpu.py [--steps 3]
"""

import argparse
import json
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)


class GenBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(ch)
        self.bn2 = nn.BatchNorm2d(ch)
        self.c1 = nn.Conv2d(ch, ch, 3, padding=1)
        self.c2 = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        h = F.interpolate(F.relu(self.bn1(x)), scale_factor=2)
        h = self.c2(F.relu(self.bn2(self.c1(h))))
        return h + F.interpolate(x, scale_factor=2)


class Generator(nn.Module):
    def __init__(self, ch=256, z_dim=128):
        super().__init__()
        self.dense = nn.Linear(z_dim, 4 * 4 * ch)
        self.blocks = nn.Sequential(GenBlock(ch), GenBlock(ch), GenBlock(ch))
        self.bn = nn.BatchNorm2d(ch)
        self.out = nn.Conv2d(ch, 3, 3, padding=1)
        self.ch = ch

    def forward(self, z):
        h = self.dense(z).view(-1, self.ch, 4, 4)
        h = self.blocks(h)
        return torch.tanh(self.out(F.relu(self.bn(h))))


def snconv(i, o, k, s=1, p=1):
    return nn.utils.parametrizations.spectral_norm(nn.Conv2d(i, o, k, s, p))


class DiscOptBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.c1 = snconv(3, ch, 3)
        self.c2 = snconv(ch, ch, 3)
        self.sk = snconv(3, ch, 1, p=0)

    def forward(self, x):
        h = F.avg_pool2d(self.c2(F.relu(self.c1(x))), 2)
        return h + self.sk(F.avg_pool2d(x, 2))


class DiscBlock(nn.Module):
    def __init__(self, ch, down):
        super().__init__()
        self.c1 = snconv(ch, ch, 3)
        self.c2 = snconv(ch, ch, 3)
        self.down = down

    def forward(self, x):
        h = self.c2(F.relu(self.c1(F.relu(x))))
        if self.down:
            h = F.avg_pool2d(h, 2)
            x = F.avg_pool2d(x, 2)
        return h + x


class Discriminator(nn.Module):
    def __init__(self, ch=128):
        super().__init__()
        self.b0 = DiscOptBlock(ch)
        self.b1 = DiscBlock(ch, True)
        self.b2 = DiscBlock(ch, False)
        self.b3 = DiscBlock(ch, False)
        self.fc = nn.utils.parametrizations.spectral_norm(nn.Linear(ch, 1))

    def forward(self, x):
        h = self.b3(self.b2(self.b1(self.b0(x))))
        return self.fc(F.relu(h).sum(dim=(2, 3)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-critic", type=int, default=5)
    args = ap.parse_args()

    g, d = Generator(), Discriminator()
    g_opt = torch.optim.Adam(g.parameters(), 2e-4, betas=(0.0, 0.9))
    d_opt = torch.optim.Adam(d.parameters(), 2e-4, betas=(0.0, 0.9))

    def fused_step():
        for _ in range(args.n_critic):
            real = torch.rand(args.batch, 3, 32, 32) * 2 - 1
            z = torch.randn(args.batch, 128)
            with torch.no_grad():
                fake = g(z)
            d_opt.zero_grad()
            loss_d = (F.relu(1 - d(real)).mean() + F.relu(1 + d(fake)).mean())
            loss_d.backward()
            d_opt.step()
        z = torch.randn(args.batch, 128)
        g_opt.zero_grad()
        loss_g = -d(g(z)).mean()
        loss_g.backward()
        g_opt.step()

    fused_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps):
        fused_step()
    dt = (time.perf_counter() - t0) / args.steps
    ips = args.n_critic * args.batch / dt
    out = {
        "cpu_baseline_images_per_sec": round(ips, 2),
        "sec_per_fused_step": round(dt, 3),
        "note": ("torch-CPU eager SNGAN CIFAR fused-equivalent step "
                 f"(batch {args.batch}, n_critic {args.n_critic}); proxy for "
                 "the reference TF1-on-CPU baseline"),
    }
    print(json.dumps(out))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "baselines_cpu.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
