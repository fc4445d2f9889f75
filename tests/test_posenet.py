"""Conformance of the posenet port (preproc/posenet.py) against a torch
model with the reference checkpoint layout.

torchvision/pytorch3d are not in this image, so the torch side is built
here from scratch as a standard ResNet18 (16-ch stem) + the reference's
Encoder conv1 + RTHead trunk, emitting a state_dict with exactly the key
names of mesh_material/posenet/*.pth (Sequential(Encoder, RTHead) under a
``module.nerf_root_rts.`` prefix, nnutils/moda.py:361-366 +
train_utils.py:899-904). Randomized weights + running stats exercise the
BN folding; outputs are compared end to end.
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

from moda_tpu.preproc.posenet import (RefPoseNet, convert_posenet_checkpoint,
                                      predict_rtk)  # noqa: E402


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idn)


class ResNet18(nn.Module):
    """Standard torchvision-resnet18 topology/keys, fc-free, 16-ch stem."""

    def __init__(self, in_channels=16):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
        self.layer2 = nn.Sequential(BasicBlock(64, 128, 2), BasicBlock(128, 128))
        self.layer3 = nn.Sequential(BasicBlock(128, 256, 2), BasicBlock(256, 256))
        self.layer4 = nn.Sequential(BasicBlock(256, 512, 2), BasicBlock(512, 512))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class ResNetConv(nn.Module):
    def __init__(self):
        super().__init__()
        self.resnet = ResNet18()

    def forward(self, x):
        return self.resnet(x)


class Encoder(nn.Module):
    """nnutils/nerf.py:536-556: resnet -> conv2d(bn) -> 4x4 maxpool -> flat."""

    def __init__(self):
        super().__init__()
        self.resnet_conv = ResNetConv()
        self.conv1 = nn.Sequential(nn.Conv2d(512, 128, 3, 1, 1, bias=True),
                                   nn.BatchNorm2d(128), nn.LeakyReLU(0.2, True))

    def forward(self, img):
        feat = self.conv1(self.resnet_conv(img))
        feat = F.max_pool2d(feat, 4, 4)
        return feat.view(img.size(0), -1)


def quaternion_to_matrix(q):
    """standard wxyz quaternion -> rotation matrix (pytorch3d semantics)."""
    w, x, y, z = q.unbind(-1)
    two_s = 2.0 / (q * q).sum(-1)
    o = torch.stack([
        1 - two_s * (y * y + z * z), two_s * (x * y - z * w), two_s * (x * z + y * w),
        two_s * (x * y + z * w), 1 - two_s * (x * x + z * z), two_s * (y * z - x * w),
        two_s * (x * z - y * w), two_s * (y * z + x * w), 1 - two_s * (x * x + y * y),
    ], -1)
    return o.reshape(q.shape[:-1] + (3, 3))


class RTHead(nn.Module):
    """nnutils/nerf.py:307-344 with D=1, in 128, out 7, raw_feat."""

    def __init__(self):
        super().__init__()
        self.xyz_encoding_1 = nn.Sequential(nn.Linear(128, 256), nn.ReLU(True))
        self.xyz_encoding_final = nn.Linear(256, 256)
        self.dir_encoding = nn.Sequential(nn.Linear(256, 128), nn.ReLU(True))
        self.sigma = nn.Linear(256, 1)
        self.rgb = nn.Sequential(nn.Linear(128, 7))
        self.beta = nn.Parameter(torch.tensor([0.01]))

    def forward(self, x):
        h = self.xyz_encoding_1(x)
        d = self.dir_encoding(self.xyz_encoding_final(h))
        rts = self.rgb(d).view(-1, 7)
        tmat = rts[:, 0:3] * 0.1
        rquat = F.normalize(rts[:, 3:7], 2, -1)
        rmat = quaternion_to_matrix(rquat).reshape(-1, 9)
        return torch.cat([rmat, tmat], -1)


@pytest.fixture(scope="module")
def torch_net_and_sd():
    g = torch.Generator().manual_seed(0)
    net = nn.Sequential(Encoder(), RTHead())
    with torch.no_grad():
        for k, v in list(net.named_parameters()) + list(net.named_buffers()):
            if k.endswith("running_mean"):
                v.copy_(torch.randn(v.shape, generator=g) * 0.05)
            elif k.endswith("running_var"):
                v.copy_(torch.rand(v.shape, generator=g) * 0.5 + 0.75)
            elif k.endswith("num_batches_tracked"):
                pass
            else:
                v.copy_(torch.randn(v.shape, generator=g) * 0.05)
    net.eval()
    sd = {"module.nerf_root_rts." + k: v.numpy()
          for k, v in net.state_dict().items()}
    return net, sd


def test_posenet_conformance(torch_net_and_sd):
    net, sd = torch_net_and_sd
    params = convert_posenet_checkpoint(sd)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 16, 112, 112)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x)).numpy()

    ours = np.asarray(RefPoseNet().apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_posenet_predict_rtk_composition(torch_net_and_sd):
    net, sd = torch_net_and_sd
    params = convert_posenet_checkpoint(sd)
    rng = np.random.default_rng(4)
    feats = rng.normal(size=(1, 112, 112, 16)).astype(np.float32)
    rtk = predict_rtk(params, feats)
    with torch.no_grad():
        ref = net(torch.tensor(np.transpose(feats, (0, 3, 1, 2)))).numpy()
    # base (I, [0,0,0.3]) composed per refine_rt (moda.py:1448-1466)
    np.testing.assert_allclose(rtk[0, :3, :3].reshape(9), ref[0, :9], atol=2e-4)
    np.testing.assert_allclose(rtk[0, :3, 3], ref[0, 9:12] + [0, 0, 0.3],
                               atol=2e-4)
    # rotation is orthonormal
    R = rtk[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_posenet_pth_roundtrip(tmp_path, torch_net_and_sd):
    """PoseWarmup.load('*.pth') routes through the converter."""
    net, sd = torch_net_and_sd
    path = str(tmp_path / "posenet.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)

    from moda_tpu.train.warmup_pose import PoseWarmup
    w = PoseWarmup(np.zeros((4, 3), np.float32), np.zeros((0, 3), np.int32),
                   np.zeros((4, 16), np.float32), d_mean=1.0)
    w.load(path)
    assert w.ref_params is not None
    feats = np.zeros((1, 112, 112, 16), np.float32)
    rtk = w.predict(feats)
    assert rtk.shape == (1, 4, 4)
    np.testing.assert_allclose(np.linalg.det(rtk[0, :3, :3]), 1.0, atol=1e-4)
