"""VCN+ optical-flow inference in JAX (torch/CUDA-free).

Port of the reference's learned-flow preprocessing network (SURVEY §2.2
"VCN+ flow net", third_party/vcnplus/models/VCNplus.py) — the inference
path exercised by auto_gen.py:69-150: PSPNet feature pyramid, per-level
correlation volumes, butterfly4D + sepConv4d volumetric filtering,
truncated soft-argmax flow regression (flow_reg), hypothesis fusion, and
the out-of-range (occlusion) head at the finest level. The expansion /
depth-change branch is omitted: auto_gen.py discards its outputs when
writing MoDA's flow artifacts (only flo-/occ- pfms are consumed).

Layout is NCHW end-to-end and weights stay in torch OIHW/OIDHW order so
converted checkpoints (``convert_vcn_checkpoint``) map 1:1; BatchNorm is
folded into conv scale/bias at conversion (inference only). Offline
preprocessing: jit-compiled per input resolution, batch 1 image pair.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# md (search half-window per level) of the released vcn_rob checkpoint:
# auto_gen.py:46 with the default --maxdisp 256.
DEFAULT_MD = (4, 4, 4, 4, 4)


def leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


def conv2d(x, p, stride=1, pad=1, dilation=1):
    """x [B,C,H,W], p {'w': [O,I,kh,kw], 'b': [O]}."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"][None, :, None, None] if "b" in p else y


def conv3d(x, p, stride=(1, 1, 1), pad=(0, 0, 0)):
    """x [B,C,D,H,W], p {'w': [O,I,kd,kh,kw], 'b': [O]}."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], stride, tuple((q, q) for q in pad),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    return y + p["b"][None, :, None, None, None] if "b" in p else y


def resize_bilinear(x, hw):
    """F.upsample(..., mode='bilinear', align_corners=False) on NCHW."""
    return jax.image.resize(x, x.shape[:2] + tuple(hw), "linear")


def cbr(x, p, stride=1, pad=1, dilation=1):
    return leaky(conv2d(x, p, stride, pad, dilation))


def residual_block(x, p, stride=1, dilation=1):
    """submodule.residualBlock (BN folded)."""
    pad = dilation if dilation > 1 else 1
    out = cbr(x, p["cbr1"], stride=stride, pad=pad, dilation=dilation)
    out = conv2d(out, p["cb2"], stride=1, pad=1)
    res = conv2d(x, p["ds"], stride=stride, pad=0) if "ds" in p else x
    return leaky(out + res)


def avg_pool_nchw(x, k):
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                              (1, 1) + k, (1, 1) + k, "VALID")
    return s / float(k[0] * k[1])


def pyramid_pooling(x, p, levels=3):
    """submodule.pyramidPooling (levels=3 in both pspnet and bfmodule)."""
    h, w = x.shape[2:]
    k_sizes = []
    for pool_size in np.linspace(1, min(h, w) // 2, levels, dtype=int):
        k_sizes.append((int(h / pool_size), int(w / pool_size)))
    k_sizes = k_sizes[::-1]
    pp_sum = x
    for i in range(levels):
        out = avg_pool_nchw(x, k_sizes[i])
        out = cbr(out, p[f"path{i}"], pad=0)
        out = resize_bilinear(out, (h, w))
        pp_sum = pp_sum + out / levels
    return leaky(pp_sum / 2.0)


def pspnet_forward(x, p):
    """submodule.pspnet(is_proj=False): image -> 5 pyramid levels
    (1/64,1/32,1/16,1/8,1/4), channels (128,128,128,64,64)."""
    c1 = cbr(x, p["convbnrelu1_1"], stride=2)
    c1 = cbr(c1, p["convbnrelu1_2"])
    c1 = cbr(c1, p["convbnrelu1_3"])
    pool1 = jax.lax.reduce_window(
        c1, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0), (1, 1), (1, 1)))
    rconv3 = residual_block(pool1, p["res_block3"], stride=2)
    conv4 = residual_block(rconv3, p["res_block5"], stride=2)
    conv5 = residual_block(conv4, p["res_block6"], stride=2)
    conv6 = residual_block(conv5, p["res_block7"], stride=2)
    conv6 = pyramid_pooling(conv6, p["pyramid_pooling"])

    conv6x = resize_bilinear(conv6, conv5.shape[2:])
    conv5 = cbr(jnp.concatenate([conv5, cbr(conv6x, p["upconv6"])], 1),
                p["iconv5"])
    conv5x = resize_bilinear(conv5, conv4.shape[2:])
    conv4 = cbr(jnp.concatenate([conv4, cbr(conv5x, p["upconv5"])], 1),
                p["iconv4"])
    conv4x = resize_bilinear(conv4, rconv3.shape[2:])
    conv3 = cbr(jnp.concatenate([rconv3, cbr(conv4x, p["upconv4"])], 1),
                p["iconv3"])
    conv3x = resize_bilinear(conv3, pool1.shape[2:])
    conv2 = cbr(jnp.concatenate([pool1, cbr(conv3x, p["upconv3"])], 1),
                p["iconv2"])
    return conv6, conv5, conv4, conv3, conv2


# ------------------------------------------------------------ 4D conv stack
def projfeat4d(x, p, stride=1):
    """conv4d.projfeat4d: 1x1 Conv3d over (u,v) with (h*w) untouched."""
    b, c, u, v, h, w = x.shape
    y = conv3d(x.reshape(b, c, u, v, h * w), p, stride=(stride, stride, 1))
    return y.reshape(b, -1, y.shape[2], y.shape[3], h, w)


def sep_conv4d(x, p, stride=1, full=False):
    """conv4d.sepConv4d: Conv3d (k,k,1) over (u,v) then (1,k,k) over (h,w).

    The torch forward applies conv2 (the uv conv) FIRST, then conv1; with
    full=False the (h,w) conv always has stride 1 (only u,v downsample).
    """
    b, c, u, v, h, w = x.shape
    k = p["conv2"]["w"].shape[2]  # ksize (3, or 1 for downsample convs)
    y = conv3d(x.reshape(b, c, u, v, h * w), p["conv2"],
               stride=(stride, stride, 1), pad=(k // 2, k // 2, 0))
    b, c2, u2, v2, _ = y.shape
    y = jax.nn.relu(y)
    hw_stride = stride if full else 1
    y = conv3d(y.reshape(b, c2, u2 * v2, h, w), p["conv1"],
               stride=(1, hw_stride, hw_stride), pad=(0, k // 2, k // 2))
    h2, w2 = y.shape[3], y.shape[4]
    if "proj" in p:
        y = conv2d(y.reshape(b, y.shape[1], u2 * v2 * h2, w2), p["proj"],
                   pad=0)
    return y.reshape(b, -1, u2, v2, h2, w2)


def sep_conv4d_block(x, p, stride=1, full=True):
    """conv4d.sepConv4dBlock (residual pair of sepConv4d)."""
    out = jax.nn.relu(sep_conv4d(x, p["conv1"], stride=stride, full=full))
    if "ds" in p:
        if full:
            x = sep_conv4d(x, p["ds"], stride=stride, full=full)
        else:
            x = projfeat4d(x, p["ds"], stride=stride)
    elif stride != 1:
        raise ValueError("strided block needs downsample params")
    return jax.nn.relu(x + sep_conv4d(out, p["conv2"], stride=1, full=full))


def _resize_uv(x, uv):
    """Bilinear resize over the (u,v) axes of [b,c,u,v,h,w]."""
    b, c, u, v, h, w = x.shape
    return jax.image.resize(x, (b, c) + tuple(uv) + (h, w), "linear")


def _resize_hw6(x, hw):
    b, c, u, v, h, w = x.shape
    return jax.image.resize(x, (b, c, u, v) + tuple(hw), "linear")


def butterfly4d(x, p, full=True):
    """conv4d.butterfly4D: U-net over the (u,v) axes of the cost volume."""
    out = jax.nn.relu(projfeat4d(x, p["proj"]))
    u, v = out.shape[2:4]
    out1 = sep_conv4d_block(out, p["conva1"], stride=2, full=full)
    u1, v1, h1, w1 = out1.shape[2:]
    out2 = sep_conv4d_block(out1, p["conva2"], stride=2, full=full)
    out2 = sep_conv4d_block(out2, p["convb3"], stride=1, full=full)
    tout1 = _resize_hw6(_resize_uv(out2, (u1, v1)), (h1, w1))
    out1 = sep_conv4d_block(tout1 + out1, p["convb2"], stride=1, full=full)
    tout = _resize_hw6(_resize_uv(out1, (u, v)), x.shape[4:6])
    return sep_conv4d_block(tout + out, p["convb1"], stride=1, full=full)


# ------------------------------------------------------------ flow modules
def corr_volume(ref, tgt, md: int, fac: int = 1):
    """VCN.corrf (eval path): cost[b,c,i,j,y,x] = ref(y,x)*tgt(y+dy,x+dx)
    with dx = i-md (u axis), dy = j-md//fac (v axis); leaky-relu'd."""
    b, c, h, w = ref.shape
    mdv = md // fac
    tp = jnp.pad(tgt, ((0, 0), (0, 0), (mdv, mdv), (md, md)))
    rows = []
    for i in range(2 * md + 1):
        dx = i  # offset into padded x: dx - md is the true shift
        cols = []
        for j in range(2 * mdv + 1):
            shifted = jax.lax.dynamic_slice(
                tp, (0, 0, j, dx), (b, c, h, w))
            cols.append(ref * shifted)
        rows.append(jnp.stack(cols, 2))
    return leaky(jnp.stack(rows, 2))  # [b,c,u,v,h,w]


def flow_reg(cost, md: int, fac: int = 1, wsize: int = 3):
    """VCNplus.flow_reg: truncated soft-argmax over the (u,v) window +
    local/global entropies. cost [B,u,v,h,w] -> ([B,2,h,w], [B,2,h,w])."""
    B, u, v, h, w = cost.shape
    flat = cost.reshape(B, u * v, h, w)
    idx = jnp.argmax(flat, 1)  # [B,h,w]
    mask = jax.nn.one_hot(idx, u * v, axis=1, dtype=cost.dtype)
    mask = mask.reshape(B, u, v, h, w)
    # dilate the argmax by a (2*wsize+1)^2 window over (u,v)
    mask = jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max,
        (1, 2 * wsize + 1, 2 * wsize + 1, 1, 1), (1, 1, 1, 1, 1),
        ((0, 0), (wsize, wsize), (wsize, wsize), (0, 0), (0, 0)))
    trunc = jnp.where(mask > 0, cost, -jnp.inf)
    prob = jax.nn.softmax(trunc.reshape(B, u * v, h, w), 1)
    prob = prob.reshape(B, u, v, h, w)

    rx = jnp.arange(-md, md + 1, dtype=cost.dtype)            # u axis
    ry = jnp.arange(-(md // fac), md // fac + 1, dtype=cost.dtype)  # v axis
    outx = jnp.sum(prob * rx[None, :, None, None, None], (1, 2))
    outy = jnp.sum(prob * ry[None, None, :, None, None], (1, 2))
    flow = jnp.stack([outx, outy], 1)

    pc = jnp.clip(prob, 1e-9, 1 - 1e-9)
    local_ent = (-prob * jnp.log(pc)).sum((1, 2)) / np.log((2 * wsize + 1) ** 2)
    gprob = jax.nn.softmax(cost.reshape(B, u * v, h, w), 1)
    gpc = jnp.clip(gprob, 1e-9, 1 - 1e-9)
    global_ent = (-gprob * jnp.log(gpc)).sum(1) / np.log(u * v)
    return flow, jnp.stack([local_ent, global_ent], 1)


def warp_by_flow(x, flo):
    """VCNplus.WarpModule: backward-warp x [B,C,H,W] by flo [B,2,H,W]
    (grid_sample align_corners=True, zero padding, in-range mask)."""
    B, C, H, W = x.shape
    gx = jnp.arange(W, dtype=x.dtype)[None, None, :] + flo[:, 0]
    gy = jnp.arange(H, dtype=x.dtype)[None, :, None] + flo[:, 1]
    inb = ((gx > 0) & (gx < W - 1) & (gy > 0) & (gy < H - 1))
    x0 = jnp.clip(jnp.floor(gx), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(gy), 0, H - 2).astype(jnp.int32)
    wx = jnp.clip(gx - x0, 0.0, 1.0)[:, None]
    wy = jnp.clip(gy - y0, 0.0, 1.0)[:, None]

    def gather(img, yy, xx):
        return jax.vmap(lambda im, y_, x_: im[:, y_, x_])(img, yy, xx)

    f00 = gather(x, y0, x0)
    f01 = gather(x, y0, x0 + 1)
    f10 = gather(x, y0 + 1, x0)
    f11 = gather(x, y0 + 1, x0 + 1)
    out = (f00 * (1 - wy) * (1 - wx) + f01 * (1 - wy) * wx
           + f10 * wy * (1 - wx) + f11 * wy * wx)
    # zero-padding outside + the module's strict in-range mask
    valid = inb[:, None].astype(x.dtype)
    return out * valid, inb


def conv_stack(x, p, n=7, out_bias=True):
    """The PWC-style dilated fusion/OOR stacks (dcX_conv / dcX_convo)."""
    dil = (1, 2, 4, 8, 16, 1)
    for i in range(n - 1):
        x = cbr(x, p[f"c{i+1}"], pad=dil[i], dilation=dil[i])
    return conv2d(x, p[f"c{n}"], pad=1)


def cost_matching(params, level, up_flow, c1, c2, flowh, enth,
                  md=DEFAULT_MD, fac=1):
    """VCN.cost_matching for one pyramid level (coarse->fine order 0..4)."""
    p = params[f"level{level}"]
    full = level == 4
    c1n = c1 / (jnp.linalg.norm(c1, axis=1, keepdims=True) + 1e-9)
    c2n = c2 / (jnp.linalg.norm(c2, axis=1, keepdims=True) + 1e-9)
    warp = c2n if level == 0 else warp_by_flow(c2n, up_flow)[0]
    lfac = fac if level == 0 else 1
    feat = corr_volume(c1n, warp, md[level], lfac)
    feat = butterfly4d(feat, p["f"], full=full)
    cost = sep_conv4d(feat, p["p"], stride=1, full=full)

    b, c, u, v, h, w = cost.shape
    flowhh, enthh = flow_reg(cost.reshape(b * c, u, v, h, w),
                             md[level], lfac)
    flowhh = flowhh.reshape(b, c, 2, h, w)
    if level > 0:
        flowhh = flowhh + up_flow[:, None]
    flowhh = flowhh.reshape(b, -1, h, w)
    enthh = enthh.reshape(b, -1, h, w)
    if level == 0:
        flowh, enth = flowhh, enthh
    else:
        flowh = jnp.concatenate(
            [flowhh, resize_bilinear(jax.lax.stop_gradient(flowh) * 2, (h, w))], 1)
        enth = jnp.concatenate([enthh, resize_bilinear(enth, (h, w))], 1)

    x = jnp.concatenate([enth, flowh, c1], 1)
    oor = conv_stack(x, p["oor"])[:, 0] if level == 4 else None
    va = conv_stack(x, p["fuse"])
    va = va.reshape(b, -1, 2, h, w)
    flow = (flowh.reshape(b, -1, 2, h, w) * jax.nn.softmax(va, 1)).sum(1)
    return flow, flowh, enth, oor


def vcn_forward(params, im, md=DEFAULT_MD, fac=1):
    """VCN.forward (eval, flow path): im [2B,3,H,W] (ref then target)
    -> (flow [B,2,H,W] full-res, occ_logits [B,H/4,W/4])."""
    bs = im.shape[0] // 2
    H, W = im.shape[2:]
    feats = pspnet_forward(im, params["pspnet"])
    flow, flowh, enth, oor = None, None, None, None
    for level in range(5):
        c = feats[level]
        c1, c2 = c[:bs], c[bs:]
        if level == 0:
            up = None
        else:
            s = 2 ** (6 - level)
            up = resize_bilinear(flow, (H // s, W // s)) * 2
        flow, flowh, enth, oor = cost_matching(
            params, level, up, c1, c2, flowh, enth, md=md, fac=fac)
    flow = resize_bilinear(flow, (H, W)) * 4
    return flow, oor


class VCNFlowPredictor:
    """auto_gen.flow_inference drop-in: (imgL, imgR) uint8 BGR (cv2
    convention, as fed by preproc.pipeline.compute_flows) ->
    (flow [H,W,3] with all-ones conf channel, occ_logits [H,W]).

    Matches the reference's resizing protocol (auto_gen.py:76-88): scale
    to ~2MP, round up to multiples of 64, subtract the checkpoint's mean,
    run on the concatenated pair, rescale flow back. The returned
    callable fits preproc.pipeline.compute_flows' ``flow_fn`` slot.
    """

    def __init__(self, params: Dict, mean: Optional[np.ndarray] = None,
                 md: Tuple[int, ...] = DEFAULT_MD, fac: int = 1,
                 testres: float = -1.0):
        self.params = params
        self.mean = np.asarray(mean if mean is not None
                               else [0.33, 0.33, 0.33], np.float32)
        self.md = tuple(md)
        self.fac = fac
        self.testres = testres
        self._jitted = {}

    def _run(self, shape):
        if shape not in self._jitted:
            md, fac = self.md, self.fac

            @jax.jit
            def f(params, im):
                return vcn_forward(params, im, md=md, fac=fac)

            self._jitted[shape] = f
        return self._jitted[shape]

    def as_flow_fn(self):
        """Adapter for preproc.pipeline.compute_flows (pair -> [H,W,2])."""
        return lambda a, b: self(a, b)[0][..., :2]

    def __call__(self, imgL: np.ndarray, imgR: np.ndarray):
        import cv2
        H, W = imgL.shape[:2]
        if self.testres <= 0:
            testres = np.sqrt(2e6 / (H * W))
        else:
            testres = self.testres
        max_h = int(H * testres // 64 * 64)
        max_w = int(W * testres // 64 * 64)
        if max_h < H * testres:
            max_h += 64
        if max_w < W * testres:
            max_w += 64
        imL = cv2.resize(imgL, (max_w, max_h)) / 255.0 - self.mean
        imR = cv2.resize(imgR, (max_w, max_h)) / 255.0 - self.mean
        # the network consumes BGR (auto_gen.py:95); inputs are already BGR
        im = np.stack([imL, imR]).transpose(0, 3, 1, 2).astype(np.float32)
        flow, occ = self._run((max_h, max_w))(self.params, jnp.asarray(im))
        flow = np.asarray(flow)[0]
        occ = np.asarray(occ)[0]
        fx = cv2.resize(flow[0], (W, H)) * W / max_w
        fy = cv2.resize(flow[1], (W, H)) * H / max_h
        occ = cv2.resize(occ, (W, H))
        flow3 = np.stack([fx, fy, np.ones_like(fx)], -1).astype(np.float32)
        return flow3, occ


# -------------------------------------------------------------- converter
def _f2(sd, conv, bn=None, eps=1e-5):
    """Fold torch conv(+BN) -> {'w','b'} keeping OIHW/OIDHW layout."""
    w = np.asarray(sd[conv + ".weight"], np.float32)
    b = np.asarray(sd[conv + ".bias"], np.float32) if conv + ".bias" in sd \
        else np.zeros(w.shape[0], np.float32)
    if bn is not None:
        g = np.asarray(sd[bn + ".weight"], np.float32)
        bb = np.asarray(sd[bn + ".bias"], np.float32)
        m = np.asarray(sd[bn + ".running_mean"], np.float32)
        v = np.asarray(sd[bn + ".running_var"], np.float32)
        s = g / np.sqrt(v + eps)
        w = w * s.reshape((-1,) + (1,) * (w.ndim - 1))
        b = (b - m) * s + bb
    return {"w": w, "b": b}


def _res_block(sd, pre):
    p = {"cbr1": _f2(sd, pre + ".convbnrelu1.cbr_unit.0",
                     pre + ".convbnrelu1.cbr_unit.1"),
         "cb2": _f2(sd, pre + ".convbn2.cb_unit.0", pre + ".convbn2.cb_unit.1")}
    if pre + ".downsample.0.weight" in sd:
        p["ds"] = _f2(sd, pre + ".downsample.0", pre + ".downsample.1")
    return p


def _sep(sd, pre, with_bn):
    if with_bn:
        p = {"conv1": _f2(sd, pre + ".conv1.0", pre + ".conv1.1"),
             "conv2": _f2(sd, pre + ".conv2.0", pre + ".conv2.1")}
        if pre + ".proj.0.weight" in sd:
            p["proj"] = _f2(sd, pre + ".proj.0", pre + ".proj.1")
    else:
        p = {"conv1": _f2(sd, pre + ".conv1"),
             "conv2": _f2(sd, pre + ".conv2")}
        if pre + ".proj.weight" in sd:
            p["proj"] = _f2(sd, pre + ".proj")
    return p


def _sepblock(sd, pre, full):
    p = {"conv1": _sep(sd, pre + ".conv1", True),
         "conv2": _sep(sd, pre + ".conv2", True)}
    if full:
        if pre + ".downsample.conv1.0.weight" in sd:
            p["ds"] = _sep(sd, pre + ".downsample", True)
    else:
        if pre + ".downsample.conv1.weight" in sd:
            p["ds"] = _f2(sd, pre + ".downsample.conv1",
                          pre + ".downsample.bn")
    return p


def _butterfly(sd, pre, full):
    return {"proj": _f2(sd, pre + ".proj.0.conv1", pre + ".proj.0.bn"),
            "conva1": _sepblock(sd, pre + ".conva1", full),
            "conva2": _sepblock(sd, pre + ".conva2", full),
            "convb3": _sepblock(sd, pre + ".convb3", full),
            "convb2": _sepblock(sd, pre + ".convb2", full),
            "convb1": _sepblock(sd, pre + ".convb1", full)}


def _stack(sd, names):
    """7-conv fusion/OOR stack; names = list of the 7 torch prefixes."""
    p = {}
    for i, n in enumerate(names[:-1]):
        p[f"c{i+1}"] = _f2(sd, n + ".0", n + ".1")
    p["c7"] = _f2(sd, names[-1])
    return p


def convert_vcn_checkpoint(sd: Dict[str, np.ndarray]) -> Dict:
    """vcn_rob-style state dict (numpy values; 'module.' prefix ok) ->
    params for vcn_forward."""
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    psp = {}
    for i in (1, 2, 3):
        psp[f"convbnrelu1_{i}"] = _f2(sd, f"pspnet.convbnrelu1_{i}.cbr_unit.0",
                                      f"pspnet.convbnrelu1_{i}.cbr_unit.1")
    for rb in (3, 5, 6, 7):
        psp[f"res_block{rb}"] = _res_block(sd, f"pspnet.res_block{rb}.0")
    psp["pyramid_pooling"] = {
        f"path{i}": _f2(sd, f"pspnet.pyramid_pooling.path_module_list.{i}.cbr_unit.0",
                        f"pspnet.pyramid_pooling.path_module_list.{i}.cbr_unit.1")
        for i in range(3)}
    for up in (6, 5, 4, 3):
        psp[f"upconv{up}"] = _f2(sd, f"pspnet.upconv{up}.1.cbr_unit.0",
                                 f"pspnet.upconv{up}.1.cbr_unit.1")
    for ic in (5, 4, 3, 2):
        psp[f"iconv{ic}"] = _f2(sd, f"pspnet.iconv{ic}.cbr_unit.0",
                                f"pspnet.iconv{ic}.cbr_unit.1")
    params = {"pspnet": psp}

    lvl_names = (6, 5, 4, 3, 2)
    for level, n in enumerate(lvl_names):
        full = level == 4
        lp = {"f": _butterfly(sd, f"f{n}", full),
              "p": _sep(sd, f"p{n}", False),
              "fuse": _stack(sd, [f"dc{n}_conv{i}" for i in range(1, 8)]),
              }
        if level == 4:
            lp["oor"] = _stack(sd, [f"dc{n}_convo.{i}" for i in range(7)])
        params[f"level{level}"] = lp
    return params


def load_vcn_checkpoint(path: str) -> Tuple[Dict, np.ndarray]:
    """Load a vcn_rob .pth (torch pickle) -> (params, mean_L)."""
    import torch
    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ck["state_dict"].items()}
    mean = np.asarray(ck.get("mean_L", [[0.33, 0.33, 0.33]])).mean(0)
    return convert_vcn_checkpoint(sd), mean
