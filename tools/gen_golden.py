"""Generate golden parity fixtures by running the PyTorch reference
(/root/reference, read-only) on fixed random inputs with fully randomized
weights, and dumping (inputs, state_dict, outputs) to an .npz.

The reference is used strictly as a runtime oracle - no code is copied.
Missing optional imports of the reference (IPython, matplotlib, tensorboard,
torchvision.models download path) are stubbed, and from_pretrained is
monkeypatched to from_name so nothing touches the network.

Usage: python tools/gen_golden.py --variant vigor --out tests/_golden/vigor.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np

REFERENCE = os.environ.get("CCVPE_REFERENCE", "/root/reference")


def _stub(name: str, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return mod


def load_reference():
    sys.path.insert(0, REFERENCE)
    # stub heavyweight/absent imports the reference pulls in at module scope
    _stub("IPython")
    _stub("IPython.display", Image=object)
    mpl = _stub("matplotlib")
    mpl.pyplot = _stub("matplotlib.pyplot")
    _stub("torchvision", models=_stub("torchvision.models"))
    _stub("torchvision.transforms")
    _stub("torchvision.utils", make_grid=object, save_image=object)
    _stub("PIL.ImageFile", LOAD_TRUNCATED_IMAGES=True)
    try:
        import PIL  # noqa: F401
    except Exception:
        _stub("PIL", ImageFile=sys.modules["PIL.ImageFile"])
    try:
        import torch.utils.tensorboard  # noqa: F401
    except Exception:
        tb = _stub("torch.utils.tensorboard", SummaryWriter=object)
        sys.modules["torch.utils.tensorboard"] = tb

    from efficientnet_pytorch.model import EfficientNet

    # avoid the pretrained-weight download (zero-egress container)
    EfficientNet.from_pretrained = classmethod(
        lambda cls, name, circular=False, **kw: cls.from_name(name, circular)
    )
    import models as ref_models
    return ref_models


def randomize(model, seed: int):
    """Randomize every parameter AND BatchNorm running stats so the parity
    test exercises the full conversion (fresh BN stats are trivially 0/1)."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="vigor",
                    choices=["vigor", "vigor_ori_prior", "kitti", "oxford",
                             "backbone", "vigor_train"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--ori-noise", type=float, default=54.0)
    args = ap.parse_args()

    import torch
    torch.manual_seed(args.seed)

    rng = np.random.default_rng(args.seed)
    out = {}

    if args.variant == "backbone":
        sys.path.insert(0, REFERENCE)
        from efficientnet_pytorch.model import EfficientNet
        for circular, tag, shape in ((False, "plain", (1, 3, 96, 128)),
                                     (True, "circular", (1, 3, 96, 128))):
            net = EfficientNet.from_name("efficientnet-b0", circular)
            randomize(net, args.seed)
            net.eval()
            x = rng.normal(size=shape).astype(np.float32)
            with torch.no_grad():
                feat, multi = net.extract_features_multiscale(torch.from_numpy(x))
            out[f"{tag}/input"] = x
            out[f"{tag}/features"] = feat.numpy()
            for i, m in enumerate(multi):
                out[f"{tag}/block{i}"] = m.numpy()
            for k, v in net.state_dict().items():
                out[f"{tag}/sd/{k}"] = v.numpy()
    elif args.variant == "vigor_train":
        # TRAIN-mode objective parity: train-mode BN (batch statistics),
        # reference GT construction (datasets.py:145-166, train_VIGOR.py:120-128)
        # and the full loss (train_VIGOR.py:137-146). drop_connect is disabled
        # in both frameworks (its RNG streams cannot be aligned).
        ref_models = load_reference()
        import efficientnet_pytorch.model as ref_effnet
        ref_effnet.drop_connect = lambda x, p, training: x
        import torch.nn as tnn
        sys.path.insert(0, REFERENCE)
        from losses import cross_entropy_loss, infoNCELoss, orientation_loss

        model = ref_models.CVM_VIGOR("cpu", circular_padding=True)
        randomize(model, args.seed)
        model.train()
        b = 2
        grd = rng.normal(size=(b, 3, 320, 640)).astype(np.float32)
        sat = rng.normal(size=(b, 3, 512, 512)).astype(np.float32)
        row_off = rng.uniform(-100, 100, b)
        col_off = rng.uniform(-100, 100, b)
        angle = rng.uniform(0, 360, b)

        # reference GT semantics (datasets.py:145-166), vectorized per sample
        gt = np.zeros((b, 1, 512, 512), np.float32)
        gt_with_ori = np.zeros((b, 20, 512, 512), np.float32)
        ori_map = np.zeros((b, 2, 512, 512), np.float32)
        for i in range(b):
            x, y = np.meshgrid(
                np.linspace(-256 + col_off[i], 256 + col_off[i], 512),
                np.linspace(-256 - row_off[i], 256 - row_off[i], 512))
            d = np.sqrt(x * x + y * y)
            g = np.exp(-(d ** 2) / (2.0 * 4.0 ** 2))
            gt[i, 0] = g
            index = int(angle[i] // 18)
            ratio = (angle[i] % 18) / 18
            if index == 0:
                gt_with_ori[i, 0] = g * (1 - ratio)
                gt_with_ori[i, 19] = g * ratio
            else:
                gt_with_ori[i, 20 - index] = g * (1 - ratio)
                gt_with_ori[i, 20 - index - 1] = g * ratio
            ori_map[i, 0] = np.cos(angle[i] * np.pi / 180)
            ori_map[i, 1] = np.sin(angle[i] * np.pi / 180)

        # PRE-forward weights + BN stats (what gets converted)
        for k, v in model.state_dict().items():
            out[f"sd/{k}"] = v.numpy().copy()

        tgt = torch.from_numpy(gt)
        tgt_ori = torch.from_numpy(gt_with_ori)
        tori_map = torch.from_numpy(ori_map)
        gt_flat = tgt.flatten(1)
        gt_flat = gt_flat / gt_flat.sum(1, keepdim=True)
        with torch.no_grad():
            logits, heatmap, ori, *scores = model(
                torch.from_numpy(grd), torch.from_numpy(sat))
            loss_ce = cross_entropy_loss(logits, gt_flat)
            loss_ori = orientation_loss(ori, tori_map, tgt)
            nces = []
            for s, f in zip(scores, [64, 32, 16, 8, 4, 2]):
                gtb = tnn.MaxPool2d(f, stride=f)(tgt_ori)
                nces.append(infoNCELoss(s.flatten(1), gtb.flatten(1)))
            loss_nce = sum(nces) / 6
            total = loss_ce + 1e4 * loss_nce + 10 * loss_ori
        out["grd"] = grd
        out["sat"] = sat
        out["row_offset"] = row_off.astype(np.float32)
        out["col_offset"] = col_off.astype(np.float32)
        out["angle_deg"] = angle.astype(np.float32)
        out["loss_ce"] = np.float32(loss_ce.item())
        out["loss_ori"] = np.float32(loss_ori.item())
        out["loss_infonce"] = np.float32(loss_nce.item())
        out["loss_total"] = np.float32(total.item())
        out["logits"] = logits.numpy()
        for i, s in enumerate(scores):
            out[f"scores{i + 1}"] = s.numpy()
        # post-forward BN running stats (train-mode EMA update parity)
        sd = model.state_dict()
        out["bn_check/mean"] = sd["sat_efficientnet._bn1.running_mean"].numpy()
        out["bn_check/var"] = sd["sat_efficientnet._bn1.running_var"].numpy()
    else:
        ref_models = load_reference()
        if args.variant == "vigor":
            model = ref_models.CVM_VIGOR("cpu", circular_padding=True)
            grd_shape = (1, 3, 320, 640)
        elif args.variant == "vigor_ori_prior":
            model = ref_models.CVM_VIGOR_ori_prior("cpu", args.ori_noise,
                                                   circular_padding=True)
            grd_shape = (1, 3, 320, 640)
            out["ori_noise"] = np.float32(args.ori_noise)
        elif args.variant == "kitti":
            model = ref_models.CVM_KITTI("cpu")
            grd_shape = (1, 3, 256, 1024)
        else:
            model = ref_models.CVM_OxfordRobotCar("cpu")
            grd_shape = (1, 3, 154, 231)
        randomize(model, args.seed)
        model.eval()
        grd = rng.normal(size=grd_shape).astype(np.float32)
        sat = rng.normal(size=(1, 3, 512, 512)).astype(np.float32)
        with torch.no_grad():
            res = model(torch.from_numpy(grd), torch.from_numpy(sat))
        logits, heatmap, ori, *scores = res
        out["grd"] = grd
        out["sat"] = sat
        out["logits"] = logits.numpy()
        out["heatmap"] = heatmap.numpy()
        out["ori"] = ori.numpy()
        for i, s in enumerate(scores):
            out[f"scores{i + 1}"] = s.numpy()
        for k, v in model.state_dict().items():
            out[f"sd/{k}"] = v.numpy()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()
