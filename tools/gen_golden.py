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
                    choices=["vigor", "vigor_ori_prior", "kitti", "oxford", "backbone"])
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
