"""Measure the reference PyTorch-CPU train-step throughput (the baseline for
bench.py's vs_baseline). Runs the reference CVM_VIGOR (randomized weights,
no download) with the full loss of train_VIGOR.py:137-150.

Measured 2026-08-17 in this container: first step 378 s, steady state
185.1 s/step (batch 8) => 0.0432 pairs/s.
"""

import sys
import time

sys.path.insert(0, "tools")
sys.path.insert(0, ".")

from gen_golden import load_reference  # noqa: E402


def main():
    ref_models = load_reference()
    import torch
    import torch.nn as nn
    sys.path.insert(0, "/root/reference")
    from losses import cross_entropy_loss, infoNCELoss, orientation_loss

    torch.manual_seed(17)
    model = ref_models.CVM_VIGOR("cpu", circular_padding=True)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    b = 8
    grd = torch.randn(b, 3, 320, 640)
    sat = torch.randn(b, 3, 512, 512)
    gt = torch.rand(b, 1, 512, 512)
    gt_flat = gt.flatten(1)
    gt_flat = gt_flat / gt_flat.sum(1, keepdim=True)
    gt_ori = torch.rand(b, 2, 512, 512)
    gt_with_ori = torch.rand(b, 20, 512, 512) ** 8

    def step():
        opt.zero_grad()
        logits, heatmap, ori, *scores = model(grd, sat)
        loss = cross_entropy_loss(logits, gt_flat) \
            + 10 * orientation_loss(ori, gt_ori, gt)
        for s, f in zip(scores, [64, 32, 16, 8, 4, 2]):
            gtb = nn.MaxPool2d(f, stride=f)(gt_with_ori)
            loss = loss + 1e4 / 6 * infoNCELoss(s.flatten(1), gtb.flatten(1))
        loss.backward()
        opt.step()

    t0 = time.time()
    step()
    print("first step", time.time() - t0, flush=True)
    t0 = time.time()
    n = 3
    for _ in range(n):
        step()
    dt = (time.time() - t0) / n
    print(f"torch cpu train step: {dt} s; pairs/s: {b / dt}")


if __name__ == "__main__":
    main()
