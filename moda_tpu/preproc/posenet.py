"""Reference pose-CNN (posenet) port: 16-ch CSE crop -> camera SE(3).

The reference's published camera-initialization route loads a pretrained
torch checkpoint ``mesh_material/posenet/{quad,human}.pth``
(scripts/template.sh:13-17, consumed at nnutils/train_utils.py:884-921)
into ``Sequential(Encoder, RTHead)`` (nnutils/moda.py:361-366):

- Encoder (nnutils/nerf.py:536-556): torchvision ResNet18 with a 16-ch
  stem (nerf.py:513-534) -> conv3x3 512->128 + BN + LeakyReLU(0.2)
  (conv2d helper, nerf.py:559-573) -> 4x4 max-pool -> flat 128 code;
- RTHead(use_quat=True, D=1, in 128, out 7) (nerf.py:307-344): a 1-layer
  NeRF-MLP trunk producing [tmat*0.1 | quaternion(normalized) -> rmat].

This module re-implements that exact inference topology in flax (NHWC,
BatchNorm folded to inference affines) plus a torch-checkpoint converter,
so the pretrained camera-init route runs TPU-native. Composition with the
base pose (identity R, z=0.3) follows create_base_se3 + refine_rt
(moda.py:1432, 1448-1466).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from moda_tpu.core import quat as Q
from moda_tpu.fields.resnet_fpn import FrozenBN, _cv, _fold_bn


class BasicBlock(nn.Module):
    """torchvision ResNet BasicBlock (inference)."""

    features: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        out = FrozenBN(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv2")(out)
        out = FrozenBN(self.features, name="bn2")(out)
        if self.has_downsample:
            sc = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                         padding="VALID", use_bias=False, name="downsample")(x)
            sc = FrozenBN(self.features, name="downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet18Conv(nn.Module):
    """ResNet18 feature trunk with a 16-ch stem (ResNetConv, nerf.py:513-534)."""

    in_channels: int = 16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = FrozenBN(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (feats, stride) in enumerate(((64, 1), (128, 2), (256, 2), (512, 2))):
            x = BasicBlock(feats, stride=stride, has_downsample=(li > 0),
                           name=f"layer{li + 1}_0")(x)
            x = BasicBlock(feats, name=f"layer{li + 1}_1")(x)
        return x


class RefPoseNet(nn.Module):
    """[N, 112, 112, 16] feature crops -> [N, 12] (rmat 9 | tmat 3).

    Exact inference graph of the reference Sequential(Encoder, RTHead)
    with the pretrained posenet checkpoint layout."""

    @nn.compact
    def __call__(self, feats):
        x = ResNet18Conv(name="resnet")(feats)           # [N, 4, 4, 512]
        x = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), name="enc_conv1")(x)
        x = FrozenBN(128, name="enc_bn1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.max_pool(x, (4, 4), strides=(4, 4))
        code = x.reshape(x.shape[0], -1)                 # [N, 128]

        # RTHead trunk (NeRF D=1 + raw_feat head, nerf.py:147-198,324-343)
        h = nn.relu(nn.Dense(256, name="xyz_encoding_1")(code))
        hf = nn.Dense(256, name="xyz_encoding_final")(h)
        d = nn.relu(nn.Dense(128, name="dir_encoding")(hf))
        out = nn.Dense(7, name="rgb")(d)

        tmat = out[:, 0:3] * 0.1
        rquat = out[:, 3:7]
        rquat = rquat / jnp.maximum(
            jnp.linalg.norm(rquat, axis=-1, keepdims=True), 1e-12)
        rmat = Q.q_to_matrix(rquat).reshape(-1, 9)
        return jnp.concatenate([rmat, tmat], -1)


# ----------------------------------------------------------------- converter
def _lin(sd, key):
    """torch Linear -> flax Dense."""
    return {"kernel": np.ascontiguousarray(sd[key + ".weight"].T).astype(np.float32),
            "bias": sd[key + ".bias"].astype(np.float32)}


def convert_posenet_checkpoint(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference posenet state dict -> RefPoseNet flax params.

    Accepts the raw torch.load dict of the .pth (keys prefixed
    ``module.nerf_root_rts.`` as saved by save_network with DDP wrapping,
    train_utils.py:899-901) or the already-stripped layout
    (``0.resnet_conv.resnet.*`` / ``1.xyz_encoding_1.*``)."""
    sd = {k.replace("module.nerf_root_rts.", ""): np.asarray(v)
          for k, v in sd.items()}

    r = "0.resnet_conv.resnet."
    resnet: Dict = {
        "conv1": {"kernel": _cv(sd[r + "conv1.weight"])},
    }
    s, b = _fold_bn(sd, r + "bn1")
    resnet["bn1"] = {"scale": s, "bias": b}
    for li in range(1, 5):
        for bi in range(2):
            t = f"{r}layer{li}.{bi}."
            blk = {}
            for ci in (1, 2):
                blk[f"conv{ci}"] = {"kernel": _cv(sd[t + f"conv{ci}.weight"])}
                s, b = _fold_bn(sd, t + f"bn{ci}")
                blk[f"bn{ci}"] = {"scale": s, "bias": b}
            if bi == 0 and li > 1:
                blk["downsample"] = {"kernel": _cv(sd[t + "downsample.0.weight"])}
                s, b = _fold_bn(sd, t + "downsample.1")
                blk["downsample_bn"] = {"scale": s, "bias": b}
            resnet[f"layer{li}_{bi}"] = blk

    params: Dict = {"resnet": resnet}
    params["enc_conv1"] = {"kernel": _cv(sd["0.conv1.0.weight"]),
                           "bias": sd["0.conv1.0.bias"].astype(np.float32)}
    s, b = _fold_bn(sd, "0.conv1.1")
    params["enc_bn1"] = {"scale": s, "bias": b}

    params["xyz_encoding_1"] = _lin(sd, "1.xyz_encoding_1.0")
    params["xyz_encoding_final"] = _lin(sd, "1.xyz_encoding_final")
    params["dir_encoding"] = _lin(sd, "1.dir_encoding.0")
    params["rgb"] = _lin(sd, "1.rgb.0")
    return params


def load_posenet(path: str) -> Dict:
    """torch .pth -> flax params (host-side, torch CPU)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return convert_posenet_checkpoint(sd)


def predict_rtk(params: Dict, feats: np.ndarray) -> np.ndarray:
    """feats [N,112,112,16] -> rtk [N,4,4]: CNN delta composed with the
    canonical base (identity R, T=[0,0,0.3]) exactly as refine_rt does for
    the cnn basis (moda.py:1432,1448-1466): R = base_R @ rmat,
    T = base_T + base_R @ tmat."""
    net = RefPoseNet()
    rts = np.asarray(net.apply({"params": params}, jnp.asarray(feats)))
    out = np.zeros((len(feats), 4, 4), np.float32)
    out[:, :3, :3] = rts[:, :9].reshape(-1, 3, 3)
    out[:, :3, 3] = rts[:, 9:12] + np.asarray([0, 0, 0.3], np.float32)
    out[:, 3, 3] = 1
    return out
