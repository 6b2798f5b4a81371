"""Measure the reference implementation's train-step throughput on this
machine (CPU torch — the only hardware the reference can run on here).

Builds the same flagship configuration as bench.py — FC[128] + 4-block
transformer encoder (h=4, d_ff=512, pre-norm) + NDCGLoss2++-style
LambdaLoss — from stock torch.nn primitives (independent implementation,
mirroring the architecture described in the reference's
contextaware_web30k/ndcgloss2pp.json config; no reference code is imported
or copied). Writes bench_baseline.json used by bench.py's ``vs_baseline``.
"""

from __future__ import annotations

import json

import os
import time

import numpy as np
import torch
import torch.nn as nn


class PreNormBlock(nn.Module):
    def __init__(self, d_model: int, h: int, d_ff: int):
        super().__init__()
        self.ln1 = nn.LayerNorm(d_model)
        self.attn = nn.MultiheadAttention(d_model, h, batch_first=True)
        self.ln2 = nn.LayerNorm(d_model)
        self.ff = nn.Sequential(
            nn.Linear(d_model, d_ff), nn.ReLU(), nn.Linear(d_ff, d_model)
        )

    def forward(self, x, key_padding_mask):
        n = self.ln1(x)
        a, _ = self.attn(n, n, n, key_padding_mask=key_padding_mask,
                         need_weights=False)
        x = x + a
        return x + self.ff(self.ln2(x))


class FlagshipRanker(nn.Module):
    def __init__(self, n_features=136, d_model=128, n_blocks=4, h=4, d_ff=512):
        super().__init__()
        self.input_norm = nn.LayerNorm(n_features)
        self.fc = nn.Linear(n_features, d_model)
        self.blocks = nn.ModuleList(
            PreNormBlock(d_model, h, d_ff) for _ in range(n_blocks)
        )
        self.final_ln = nn.LayerNorm(d_model)
        self.head = nn.Linear(d_model, 1)

    def forward(self, x, mask):
        x = torch.relu(self.fc(self.input_norm(x)))
        for b in self.blocks:
            x = b(x, key_padding_mask=mask)
        return self.head(self.final_ln(x)).squeeze(-1)


def lambda_loss_ndcg2pp(scores, labels, mask, mu=10.0):
    """NDCGLoss2++-shaped pairwise loss (sorted pairwise sigmoid with
    |gain-delta * discount-delta| weighting) — same compute shape/complexity
    as the reference loss."""
    big_neg = -1e9
    scores = scores.masked_fill(mask, big_neg)
    sorted_scores, order = scores.sort(descending=True, dim=-1)
    sorted_labels = labels.gather(1, order)
    sorted_pad = sorted_labels < 0

    g = (torch.pow(2.0, sorted_labels.clamp(min=0)) - 1.0)
    idcg = (torch.sort(g, descending=True, dim=-1).values /
            torch.log2(torch.arange(2, g.shape[1] + 2, dtype=g.dtype))).sum(
                -1, keepdim=True).clamp(min=1e-8)
    g = g / idcg
    d = 1.0 / torch.log2(torch.arange(2, g.shape[1] + 2, dtype=g.dtype))

    g_diff = g[:, :, None] - g[:, None, :]
    d_diff = (d[None, :, None] - d[None, None, :]).abs()
    s_diff = sorted_scores[:, :, None] - sorted_scores[:, None, :]
    valid = (~sorted_pad[:, :, None]) & (~sorted_pad[:, None, :])
    label_gt = (sorted_labels[:, :, None] - sorted_labels[:, None, :]) > 0

    weights = (g_diff.abs() * d_diff + mu * g_diff.abs()) * label_gt
    probs = torch.sigmoid(s_diff).clamp(1e-8, 1 - 1e-8)
    losses = -torch.log2(probs) * weights * valid
    return losses.sum() / labels.shape[0]


def main():
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    batch, slate, feats = 64, 240, 136

    model = FlagshipRanker(feats)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    rng = np.random.RandomState(0)
    x = torch.tensor(rng.randn(batch, slate, feats), dtype=torch.float32)
    y = torch.tensor(rng.randint(0, 5, size=(batch, slate)), dtype=torch.float32)
    y[:, -40:] = -1.0
    mask = y == -1.0

    def step():
        opt.zero_grad()
        scores = model(x, mask)
        loss = lambda_loss_ndcg2pp(scores, y, mask)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(2):
        step()
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    dt = time.perf_counter() - t0
    slates_per_sec = batch * n_steps / dt

    out = {
        "slates_per_sec": round(slates_per_sec, 2),
        "hardware": f"cpu ({os.cpu_count()} threads), torch {torch.__version__}",
        "config": "FC[128] + transformer N=4 h=4 d_ff=512 + NDCGLoss2++-style "
                  "lambda loss, batch 64, slate 240, 136 features",
        "note": "reference-equivalent architecture measured on this machine's "
                "CPU; the reference repo publishes no throughput numbers",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "bench_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
