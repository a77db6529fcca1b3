"""PyTorch state_dict -> Flax variables conversion.

Converts reference checkpoints (CVM_* state dicts, reference
train_VIGOR.py:252) and ImageNet EfficientNet-B0 weights
(efficientnet_pytorch/utils.py:729-758) into this framework's parameter
pytrees. Works on plain numpy dicts, so callers can feed either
`{k: v.numpy() for k, v in torch.load(p).items()}` or an .npz archive -
no torch dependency here.

Layout conversions:
  Conv2d           OIHW -> HWIO                    transpose(2, 3, 1, 0)
  depthwise Conv2d (C,1,k,k) -> (k,k,1,C)          transpose(2, 3, 1, 0)
  Linear           (out,in) -> (in,out)            .T
  ConvTranspose2d  (in,out,2,2) -> (2,2,in,out)    transpose(2, 3, 0, 1)
  BatchNorm        weight/bias/running_mean/var -> scale/bias + batch_stats
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

Array = np.ndarray
Flat = Dict[Tuple[str, ...], Array]


def _conv(w: Array) -> Array:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _deconv(w: Array) -> Array:
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def _take(sd: Mapping[str, Array], key: str) -> Array:
    if key not in sd:
        raise KeyError(f"missing torch key: {key}")
    return np.asarray(sd[key])


def convert_backbone(
    sd: Mapping[str, Array], prefix: str = ""
) -> Tuple[Flat, Flat]:
    """Reference EfficientNet state dict -> (params, batch_stats) flat dicts.

    Torch names from efficientnet_pytorch/model.py:162-219 (_conv_stem, _bn0,
    _blocks.N._{expand,depthwise,project}_conv / _bn{0,1,2} / _se_{reduce,expand},
    _conv_head, _bn1).
    """
    params: Flat = {}
    stats: Flat = {}

    def bn(torch_name: str, path: Tuple[str, ...]):
        params[path + ("bn", "scale")] = _take(sd, f"{prefix}{torch_name}.weight")
        params[path + ("bn", "bias")] = _take(sd, f"{prefix}{torch_name}.bias")
        stats[path + ("bn", "mean")] = _take(sd, f"{prefix}{torch_name}.running_mean")
        stats[path + ("bn", "var")] = _take(sd, f"{prefix}{torch_name}.running_var")

    params[("stem_conv", "kernel")] = _conv(_take(sd, f"{prefix}_conv_stem.weight"))
    bn("_bn0", ("stem_bn",))

    i = 0
    while f"{prefix}_blocks.{i}._depthwise_conv.weight" in sd:
        blk = ("block%d" % i,)
        t = f"{prefix}_blocks.{i}."
        if f"{t}_expand_conv.weight" in sd:
            params[blk + ("expand_conv", "kernel")] = _conv(_take(sd, f"{t}_expand_conv.weight"))
            bn(f"_blocks.{i}._bn0", blk + ("bn0",))
        params[blk + ("depthwise_conv", "kernel")] = _conv(_take(sd, f"{t}_depthwise_conv.weight"))
        bn(f"_blocks.{i}._bn1", blk + ("bn1",))
        params[blk + ("se", "reduce", "kernel")] = _conv(_take(sd, f"{t}_se_reduce.weight"))
        params[blk + ("se", "reduce", "bias")] = _take(sd, f"{t}_se_reduce.bias")
        params[blk + ("se", "expand", "kernel")] = _conv(_take(sd, f"{t}_se_expand.weight"))
        params[blk + ("se", "expand", "bias")] = _take(sd, f"{t}_se_expand.bias")
        params[blk + ("project_conv", "kernel")] = _conv(_take(sd, f"{t}_project_conv.weight"))
        bn(f"_blocks.{i}._bn2", blk + ("bn2",))
        i += 1

    params[("head_conv", "kernel")] = _conv(_take(sd, f"{prefix}_conv_head.weight"))
    bn("_bn1", ("head_bn",))
    return params, stats


def convert_cvm(sd: Mapping[str, Array], num_scales: int = 6) -> Tuple[Flat, Flat]:
    """Reference CVM_* state dict -> (params, batch_stats) flat dicts keyed by
    this framework's module paths (models/cvm.py)."""
    params: Flat = {}
    stats: Flat = {}

    for enc, torch_enc in (("grd_encoder", "grd_efficientnet"),
                           ("sat_encoder", "sat_efficientnet")):
        p, s = convert_backbone(sd, prefix=f"{torch_enc}.")
        params.update({(enc,) + k: v for k, v in p.items()})
        stats.update({(enc,) + k: v for k, v in s.items()})

    # ground descriptor heads (models.py:57-97)
    for n in range(1, num_scales + 1):
        t = f"grd_feature_to_descriptor{n}."
        path = (f"grd_desc{n}",)
        params[path + ("compress", "kernel")] = _conv(_take(sd, t + "0.weight"))
        params[path + ("compress", "bias")] = _take(sd, t + "0.bias")
        w = _take(sd, t + "2.weight")  # [1, H, 1, 1]
        params[path + ("h_weight",)] = w.reshape(1, w.shape[1])
        params[path + ("h_bias",)] = _take(sd, t + "2.bias")

    # aerial chunk head (models.py:102-104)
    params[("sat_desc", "linear", "kernel")] = _take(
        sd, "sat_feature_to_descriptors.1.weight").T
    params[("sat_desc", "linear", "bias")] = _take(
        sd, "sat_feature_to_descriptors.1.bias")

    def double_conv(torch_name: str, path: Tuple[str, ...]):
        params[path + ("conv_a", "kernel")] = _conv(_take(sd, f"{torch_name}.0.weight"))
        params[path + ("conv_a", "bias")] = _take(sd, f"{torch_name}.0.bias")
        params[path + ("conv_b", "kernel")] = _conv(_take(sd, f"{torch_name}.2.weight"))
        params[path + ("conv_b", "bias")] = _take(sd, f"{torch_name}.2.bias")

    # decoders: reference deconv6..deconv1 = stages 1..6 coarse->fine
    for s in range(num_scales):
        ref_n = num_scales - s
        for branch, suffix in (("loc", ""), ("ori", "_ori")):
            stage = (f"{branch}_stage{s + 1}",)
            params[stage + ("deconv", "kernel")] = _deconv(
                _take(sd, f"deconv{ref_n}{suffix}.weight"))
            params[stage + ("deconv", "bias")] = _take(sd, f"deconv{ref_n}{suffix}.bias")
            if ref_n > 1:  # conv6..conv2 are double_convs; conv1 is the head
                double_conv(f"conv{ref_n}{suffix}", stage + ("conv",))
    double_conv("conv1", ("loc_head",))
    double_conv("conv1_ori", ("ori_head",))
    return params, stats


def _conv_inv(w: Array) -> Array:
    return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))


def _deconv_inv(w: Array) -> Array:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 0, 1))


def export_cvm(params: Mapping[str, Any], batch_stats: Mapping[str, Any],
               num_scales: int = 6) -> Dict[str, Array]:
    """Inverse of convert_cvm: this framework's CVM variables -> a reference-
    format state dict (torch names/layouts, models.py:49-148), so checkpoints
    trained here can be evaluated with the original PyTorch scripts.

    Returns numpy arrays; save with
    `torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)`.
    """
    p = flatten(params)
    s = flatten(batch_stats)
    sd: Dict[str, Array] = {}

    def bn(path: Tuple[str, ...], torch_name: str):
        sd[f"{torch_name}.weight"] = np.asarray(p[path + ("bn", "scale")])
        sd[f"{torch_name}.bias"] = np.asarray(p[path + ("bn", "bias")])
        sd[f"{torch_name}.running_mean"] = np.asarray(s[path + ("bn", "mean")])
        sd[f"{torch_name}.running_var"] = np.asarray(s[path + ("bn", "var")])
        sd[f"{torch_name}.num_batches_tracked"] = np.asarray(0)

    for enc, torch_enc in (("grd_encoder", "grd_efficientnet"),
                           ("sat_encoder", "sat_efficientnet")):
        sd[f"{torch_enc}._conv_stem.weight"] = _conv_inv(p[(enc, "stem_conv", "kernel")])
        bn((enc, "stem_bn"), f"{torch_enc}._bn0")
        i = 0
        while (enc, f"block{i}", "depthwise_conv", "kernel") in p:
            blk = (enc, f"block{i}")
            t = f"{torch_enc}._blocks.{i}."
            if blk + ("expand_conv", "kernel") in p:
                sd[t + "_expand_conv.weight"] = _conv_inv(p[blk + ("expand_conv", "kernel")])
                bn(blk + ("bn0",), t + "_bn0")
            sd[t + "_depthwise_conv.weight"] = _conv_inv(p[blk + ("depthwise_conv", "kernel")])
            bn(blk + ("bn1",), t + "_bn1")
            sd[t + "_se_reduce.weight"] = _conv_inv(p[blk + ("se", "reduce", "kernel")])
            sd[t + "_se_reduce.bias"] = np.asarray(p[blk + ("se", "reduce", "bias")])
            sd[t + "_se_expand.weight"] = _conv_inv(p[blk + ("se", "expand", "kernel")])
            sd[t + "_se_expand.bias"] = np.asarray(p[blk + ("se", "expand", "bias")])
            sd[t + "_project_conv.weight"] = _conv_inv(p[blk + ("project_conv", "kernel")])
            bn(blk + ("bn2",), t + "_bn2")
            i += 1
        sd[f"{torch_enc}._conv_head.weight"] = _conv_inv(p[(enc, "head_conv", "kernel")])
        bn((enc, "head_bn"), f"{torch_enc}._bn1")

    for n in range(1, num_scales + 1):
        path = (f"grd_desc{n}",)
        t = f"grd_feature_to_descriptor{n}."
        sd[t + "0.weight"] = _conv_inv(p[path + ("compress", "kernel")])
        sd[t + "0.bias"] = np.asarray(p[path + ("compress", "bias")])
        hw = np.asarray(p[path + ("h_weight",)])
        sd[t + "2.weight"] = hw.reshape(1, hw.shape[1], 1, 1)
        sd[t + "2.bias"] = np.asarray(p[path + ("h_bias",)])

    sd["sat_feature_to_descriptors.1.weight"] = np.asarray(
        p[("sat_desc", "linear", "kernel")]).T
    sd["sat_feature_to_descriptors.1.bias"] = np.asarray(
        p[("sat_desc", "linear", "bias")])

    def double_conv(path: Tuple[str, ...], torch_name: str):
        sd[f"{torch_name}.0.weight"] = _conv_inv(p[path + ("conv_a", "kernel")])
        sd[f"{torch_name}.0.bias"] = np.asarray(p[path + ("conv_a", "bias")])
        sd[f"{torch_name}.2.weight"] = _conv_inv(p[path + ("conv_b", "kernel")])
        sd[f"{torch_name}.2.bias"] = np.asarray(p[path + ("conv_b", "bias")])

    for st in range(num_scales):
        ref_n = num_scales - st
        for branch, suffix in (("loc", ""), ("ori", "_ori")):
            stage = (f"{branch}_stage{st + 1}",)
            sd[f"deconv{ref_n}{suffix}.weight"] = _deconv_inv(
                p[stage + ("deconv", "kernel")])
            sd[f"deconv{ref_n}{suffix}.bias"] = np.asarray(p[stage + ("deconv", "bias")])
            if ref_n > 1:
                double_conv(stage + ("conv",), f"conv{ref_n}{suffix}")
    double_conv(("loc_head",), "conv1")
    double_conv(("ori_head",), "conv1_ori")
    return sd


def init_with_pretrained_backbone(variables: Dict[str, Any],
                                  backbone_sd: Mapping[str, Array]
                                  ) -> Dict[str, Any]:
    """Fill BOTH encoders of freshly-initialized CVM variables from a single
    ImageNet EfficientNet-B0 state dict (the reference initializes grd and sat
    encoders from the same pretrained weights, models.py:55,99; FC head
    dropped, utils.py:729-758). Heads/decoders keep their random init.

    `backbone_sd` is the torch state dict as numpy (e.g.
    {k: v.numpy() for k, v in torch.load('efficientnet-b0-355c32eb.pth').items()}).
    """
    params, stats = convert_backbone(backbone_sd)
    out_p = dict(flatten(variables["params"]))
    out_s = dict(flatten(variables.get("batch_stats", {})))
    for enc in ("grd_encoder", "sat_encoder"):
        for k, v in params.items():
            key = (enc,) + k
            if key not in out_p:
                raise KeyError(f"unexpected backbone param {key}")
            if tuple(out_p[key].shape) != tuple(v.shape):
                raise ValueError(f"{key}: {v.shape} != {out_p[key].shape}")
            out_p[key] = v.astype(np.float32)
        for k, v in stats.items():
            out_s[(enc,) + k] = v.astype(np.float32)
    result = {"params": unflatten(out_p)}
    if out_s:
        result["batch_stats"] = unflatten(out_s)
    return result


def load_state_dict_numpy(path: str) -> Dict[str, Array]:
    """Load a torch .pt/.pth state dict or an .npz archive as a flat
    {name: numpy array} dict (torch imported lazily, only for .pt/.pth)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def unflatten(flat: Flat) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value
    return tree


def flatten(tree: Mapping[str, Any], prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    """Flatten a nested mapping; leaves are kept as-is (arrays or anything
    with a .shape, e.g. jax.ShapeDtypeStruct from eval_shape)."""
    out: Dict[Tuple[str, ...], Any] = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def to_variables(params: Flat, stats: Flat, reference_vars: Mapping[str, Any]
                 ) -> Dict[str, Any]:
    """Assemble a Flax variables dict, checking exact agreement of tree
    structure and leaf shapes against an `init`-produced reference."""
    ref_p = flatten(reference_vars["params"])
    ref_s = flatten(reference_vars.get("batch_stats", {}))
    for name, ours, ref in (("params", params, ref_p), ("batch_stats", stats, ref_s)):
        missing = set(ref) - set(ours)
        extra = set(ours) - set(ref)
        if missing or extra:
            raise ValueError(
                f"{name} mismatch; missing={sorted(missing)[:8]} extra={sorted(extra)[:8]}")
        for k in ref:
            if tuple(ours[k].shape) != tuple(ref[k].shape):
                raise ValueError(f"{name} {k}: shape {ours[k].shape} != {ref[k].shape}")
    out = {"params": unflatten({k: v.astype(np.float32) for k, v in params.items()})}
    if stats:
        out["batch_stats"] = unflatten({k: v.astype(np.float32) for k, v in stats.items()})
    return out
