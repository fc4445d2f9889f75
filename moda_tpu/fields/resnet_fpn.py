"""ResNet-50 + FPN backbone in flax, detectron2-weight compatible.

The inference backbone of the reference's external preprocessing models
(PointRend instance segmentation and DensePose-CSE, SURVEY §2.2
"detectron2"): re-implemented TPU-native so converted checkpoints run the
CSE feature extraction without detectron2. Matches detectron2's
structural choices:

- FrozenBatchNorm (inference affine: y = x * scale + bias with
  scale = gamma/sqrt(var+eps), folded by the converter);
- stride-2 placed on the 3x3 conv of bottlenecks (torchvision/d2 style);
- FPN with 1x1 laterals + 3x3 output convs, levels p2..p5.

Weight conversion: ``convert_resnet50_fpn`` maps a detectron2
``model.state_dict()``-style dict of numpy arrays (keys like
``backbone.bottom_up.res2.0.conv1.weight``) onto the flax tree.
"""
from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class FrozenBN(nn.Module):
    """Inference-time affine standing in for BatchNorm."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    has_shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        # explicit torch-style paddings: flax SAME pads asymmetrically for
        # stride-2 convs, which would shift borders vs the converted weights
        out = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                      padding="VALID", name="conv1")(x)
        out = FrozenBN(self.bottleneck_channels, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.bottleneck_channels, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(out)
        out = FrozenBN(self.bottleneck_channels, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      padding="VALID", name="conv3")(out)
        out = FrozenBN(self.out_channels, name="bn3")(out)
        if self.has_shortcut:
            sc = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, self.stride),
                         padding="VALID", use_bias=False, name="shortcut")(x)
            sc = FrozenBN(self.out_channels, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet50(nn.Module):
    """Returns {res2, res3, res4, res5} feature maps (NHWC)."""

    stage_blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="stem_conv")(x)
        x = FrozenBN(64, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = {}
        channels = [256, 512, 1024, 2048]
        for si, (nblocks, out_ch) in enumerate(zip(self.stage_blocks, channels)):
            stride = 1 if si == 0 else 2
            for bi in range(nblocks):
                x = Bottleneck(
                    out_channels=out_ch, bottleneck_channels=out_ch // 4,
                    stride=stride if bi == 0 else 1, has_shortcut=(bi == 0),
                    name=f"res{si+2}_{bi}",
                )(x)
            outs[f"res{si+2}"] = x
        return outs


class FPN(nn.Module):
    out_channels: int = 256

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        names = ["res5", "res4", "res3", "res2"]
        laterals = {
            n: nn.Conv(self.out_channels, (1, 1), name=f"lateral_{n}")(feats[n])
            for n in names
        }
        out = {}
        prev = laterals["res5"]
        out["p5"] = nn.Conv(self.out_channels, (3, 3), name="output_p5")(prev)
        for n, p in (("res4", "p4"), ("res3", "p3"), ("res2", "p2")):
            up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
            up = up[:, : laterals[n].shape[1], : laterals[n].shape[2]]
            prev = laterals[n] + up
            out[p] = nn.Conv(self.out_channels, (3, 3), name=f"output_{p}")(prev)
        return out


class ResNetFPN(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = ResNet50(name="bottom_up")(x)
        return FPN(name="fpn")(feats)


# ----------------------------------------------------------------- converter
def _cv(w: np.ndarray) -> np.ndarray:
    """torch conv weight [O,I,kh,kw] -> flax [kh,kw,I,O]."""
    return np.transpose(w, (2, 3, 1, 0))


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str, eps: float = 1e-5):
    """detectron2 FrozenBatchNorm params -> (scale, bias)."""
    g = sd[prefix + ".weight"]
    b = sd[prefix + ".bias"]
    mean = sd.get(prefix + ".running_mean", np.zeros_like(g))
    var = sd.get(prefix + ".running_var", np.ones_like(g))
    scale = g / np.sqrt(var + eps)
    return scale.astype(np.float32), (b - mean * scale).astype(np.float32)


def convert_resnet50_fpn(sd: Dict[str, np.ndarray], prefix: str = "backbone.") -> Dict:
    """detectron2 state dict -> flax params for ResNetFPN.

    Accepts the d2 key layout: ``backbone.bottom_up.stem.conv1.*``,
    ``backbone.bottom_up.res{2..5}.{i}.conv{1..3}.*`` (+ .norm),
    ``backbone.fpn_lateral{2..5}.*``, ``backbone.fpn_output{2..5}.*``.
    """
    bu = prefix + "bottom_up."
    params: Dict = {"bottom_up": {}, "fpn": {}}
    p = params["bottom_up"]
    p["stem_conv"] = {"kernel": _cv(sd[bu + "stem.conv1.weight"])}
    s, b = _fold_bn(sd, bu + "stem.conv1.norm")
    p["stem_bn"] = {"scale": s, "bias": b}

    stage_blocks = (3, 4, 6, 3)
    for si, nblocks in enumerate(stage_blocks):
        res = f"res{si+2}"
        for bi in range(nblocks):
            d2b = f"{bu}{res}.{bi}."
            blk = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = {"kernel": _cv(sd[d2b + f"conv{ci}.weight"])}
                s, b = _fold_bn(sd, d2b + f"conv{ci}.norm")
                blk[f"bn{ci}"] = {"scale": s, "bias": b}
            if bi == 0:
                blk["shortcut"] = {"kernel": _cv(sd[d2b + "shortcut.weight"])}
                s, b = _fold_bn(sd, d2b + "shortcut.norm")
                blk["shortcut_bn"] = {"scale": s, "bias": b}
            p[f"{res}_{bi}"] = blk

    f = params["fpn"]
    for lvl, res in ((2, "res2"), (3, "res3"), (4, "res4"), (5, "res5")):
        f[f"lateral_{res}"] = {
            "kernel": _cv(sd[f"{prefix}fpn_lateral{lvl}.weight"]),
            "bias": sd[f"{prefix}fpn_lateral{lvl}.bias"].astype(np.float32),
        }
        f[f"output_p{lvl}"] = {
            "kernel": _cv(sd[f"{prefix}fpn_output{lvl}.weight"]),
            "bias": sd[f"{prefix}fpn_output{lvl}.bias"].astype(np.float32),
        }
    return params
