"""Fused Pallas TPU kernel for the NeRF-style MLP stack.

Why: the training step is HBM-bandwidth-bound. XLA evaluates the 8x256
trunk layer-by-layer, so every activation tensor ([R*S, 256] fp32 =
268 MB at the recipe's 2048x128 ray bundle) round-trips through HBM
once per layer forward and twice backward (~70% of step time at
round-2's 74 ms/step, profile in DESIGN.md §8). This kernel keeps the
whole stack's activations in VMEM: per grid step it loads one block of
embedded inputs, runs every layer on the MXU in bf16 (fp32 accumulation),
and writes only the final [block, out+1] result. The backward kernel
rematerializes activations in VMEM (flash-attention-style) and
accumulates weight grads in VMEM across the sequential TPU grid.

Architecture mirrored (nets.NeRFMLP == reference nnutils/nerf.py:83-198):
  h = x[:, :in_xyz]
  for i in range(D):  h = relu(W_i @ (concat(x_xyz, h) if i in skips else h))
  sigma = W_sigma @ h
  h_final = W_final @ h
  hd = relu(W_dir @ concat(h_final, x[:, in_xyz:in_xyz+in_dir]))
  out = concat(W_out @ hd, sigma)          # [N, out_ch+1]

The caller applies the raw_feat/sigmoid semantics (nets.py:60-73).

Weights stay fp32 in HBM (the optimizer's master copy); the kernel casts
to bf16 at matmul inputs only. Gradients are fp32 end-to-end.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # compiled Mosaic kernels need real TPU hardware; CPU tests (and the
    # 8-virtual-device conftest backend) run the interpreter
    return jax.default_backend() != "tpu"


def _arch_fields(D: int, skips: Tuple[int, ...]):
    """Ordered weight-tensor names for the stack."""
    names = []
    for i in range(D):
        names.append(f"xyz_{i+1}")
    names += ["sigma", "xyz_final", "dir", "rgb"]
    return names


def flatten_params(p: dict, D: int) -> Tuple[jnp.ndarray, ...]:
    """flax NeRFMLP param dict -> flat (k1,b1,k2,b2,...) tuple.

    Biases are reshaped to [1, W]: TPU VMEM tiling wants >=2D operands."""
    out = []
    for n in _arch_fields(D, ()):
        out.append(p[n]["kernel"])
        out.append(p[n]["bias"].reshape(1, -1))
    return tuple(out)


def _mm(a, b, cdt):
    return jax.lax.dot_general(
        a.astype(cdt), b.astype(cdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _forward_block(x, ws, arch, cdt, want_acts=False):
    """Run the whole stack on one [BN, C] block; weights as flat list.

    Returns (out [BN, out+1], acts) where acts = per-layer inputs needed
    by the backward pass (None unless want_acts).
    """
    D, in_xyz, in_dir, skips = arch
    xin = x[:, :in_xyz]
    acts = []
    h = xin
    for i in range(D):
        if i in skips:
            h = jnp.concatenate([xin, h], -1)
        if want_acts:
            acts.append(h)
        k, b = ws[2 * i], ws[2 * i + 1]
        h = jnp.maximum(_mm(h, k, cdt) + b, 0.0)
    if want_acts:
        acts.append(h)  # input to sigma / xyz_final
    ksig, bsig = ws[2 * D], ws[2 * D + 1]
    kfin, bfin = ws[2 * D + 2], ws[2 * D + 3]
    kdir, bdir = ws[2 * D + 4], ws[2 * D + 5]
    kout, bout = ws[2 * D + 6], ws[2 * D + 7]
    sigma = _mm(h, ksig, cdt) + bsig
    h_final = _mm(h, kfin, cdt) + bfin
    if in_dir > 0:
        hd_in = jnp.concatenate([h_final, x[:, in_xyz:in_xyz + in_dir]], -1)
    else:
        hd_in = h_final
    if want_acts:
        acts.append(hd_in)
    hd = jnp.maximum(_mm(hd_in, kdir, cdt) + bdir, 0.0)
    if want_acts:
        acts.append(hd)
    out = jnp.concatenate([_mm(hd, kout, cdt) + bout, sigma], -1)
    return out, (acts if want_acts else None)


def _fwd_kernel(arch, cdt, x_ref, *refs):
    o_ref = refs[-1]
    ws = [r[:] for r in refs[:-1]]
    out, _ = _forward_block(x_ref[:], ws, arch, cdt)
    o_ref[:] = out


def _bwd_kernel(arch, cdt, nw, x_ref, g_ref, *refs):
    """refs = (w_refs..., dx_ref, dw_refs...). Weight-grad outputs use a
    constant index map, so the same VMEM block persists across the
    (sequential) TPU grid — init at step 0, accumulate afterwards."""
    D, in_xyz, in_dir, skips = arch
    w_refs = refs[:nw]
    dx_ref = refs[nw]
    dw_refs = refs[nw + 1:]
    ws = [r[:] for r in w_refs]
    x = x_ref[:]
    g = g_ref[:]

    _, acts = _forward_block(x, ws, arch, cdt, want_acts=True)
    # acts: [layer inputs 0..D-1, h_trunk, hd_in, hd]
    h_trunk = acts[D]
    hd_in = acts[D + 1]
    hd = acts[D + 2]

    out_ch = g.shape[1] - ws[2 * D].shape[1]  # g = [d_out | d_sigma]
    d_out = g[:, :out_ch]
    d_sigma = g[:, out_ch:]

    dws = [None] * len(ws)

    def mmT_nt(a, b):  # a.T @ b -> [K, N] grads for kernels
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mm_nt(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # rgb head
    dws[2 * D + 6] = mmT_nt(hd, d_out)
    dws[2 * D + 7] = d_out.sum(0, keepdims=True)
    d_hd = mm_nt(d_out, ws[2 * D + 6])
    d_hd = jnp.where(hd > 0.0, d_hd, 0.0)
    # dir layer
    dws[2 * D + 4] = mmT_nt(hd_in, d_hd)
    dws[2 * D + 5] = d_hd.sum(0, keepdims=True)
    d_hd_in = mm_nt(d_hd, ws[2 * D + 4])
    W_fin_out = ws[2 * D + 2].shape[1]
    d_h_final = d_hd_in[:, :W_fin_out]
    d_x_dir = d_hd_in[:, W_fin_out:]
    # xyz_final
    dws[2 * D + 2] = mmT_nt(h_trunk, d_h_final)
    dws[2 * D + 3] = d_h_final.sum(0, keepdims=True)
    # sigma head
    dws[2 * D] = mmT_nt(h_trunk, d_sigma)
    dws[2 * D + 1] = d_sigma.sum(0, keepdims=True)
    d_h = mm_nt(d_h_final, ws[2 * D + 2]) + mm_nt(d_sigma, ws[2 * D])

    d_xin = jnp.zeros((x.shape[0], in_xyz), jnp.float32)
    for i in range(D - 1, -1, -1):
        # d_h is grad wrt relu output of layer i; acts[i] is its input
        h_out = acts[i + 1] if i + 1 <= D else None
        # relu mask: output of layer i is acts[i+1] for i < D-1... careful:
        # acts[i+1] for i<D is the *input of layer i+1*, which equals the
        # relu output of layer i unless i+1 in skips (then it's a concat).
        # Recompute the mask from the pre-skip part instead:
        if (i + 1) in skips and i + 1 < D:
            relu_out = acts[i + 1][:, in_xyz:]
        else:
            relu_out = acts[i + 1] if i < D else None
        d_h = jnp.where(relu_out > 0.0, d_h, 0.0)
        dws[2 * i] = mmT_nt(acts[i], d_h)
        dws[2 * i + 1] = d_h.sum(0, keepdims=True)
        d_in = mm_nt(d_h, ws[2 * i])
        if i in skips:
            d_xin = d_xin + d_in[:, :in_xyz]
            d_h = d_in[:, in_xyz:]
        else:
            d_h = d_in
    d_xin = d_xin + d_h

    parts = [d_xin]
    if in_dir > 0:
        parts.append(d_x_dir)
    extra = x.shape[1] - in_xyz - in_dir
    if extra > 0:
        parts.append(jnp.zeros((x.shape[0], extra), jnp.float32))
    dx_ref[:] = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]

    first = pl.program_id(0) == 0
    for r, dw in zip(dw_refs, dws):
        v = dw.reshape(r.shape)

        @pl.when(first)
        def _(r=r, v=v):
            r[:] = v

        @pl.when(jnp.logical_not(first))
        def _(r=r, v=v):
            r[:] = r[:] + v


def _pad_rows(x, bn):
    n = x.shape[0]
    pad = (-n) % bn
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_mlp(x, weights, arch, block_n, block_bwd, cdt):
    out, _ = _fused_mlp_fwd(x, weights, arch, block_n, block_bwd, cdt)
    return out


def _call_fwd(x, weights, arch, block_n, cdt):
    xp, n = _pad_rows(x, block_n)
    N = xp.shape[0]
    out_dim = weights[-2].shape[1] + 1  # rgb out + sigma
    grid = (N // block_n,)
    w_specs = [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM) for w in weights]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, arch, cdt),
        out_shape=jax.ShapeDtypeStruct((N, out_dim), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((block_n, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec((block_n, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xp, *weights)
    return out[:n]


def _fused_mlp_fwd(x, weights, arch, block_n, block_bwd, cdt):
    out = _call_fwd(x, weights, arch, block_n, cdt)
    return out, (x, weights)


def _fused_mlp_bwd(arch, block_n, block_bwd, cdt, res, g):
    block_n = block_bwd
    x, weights = res
    xp, n = _pad_rows(x, block_n)
    gp, _ = _pad_rows(g, block_n)
    N = xp.shape[0]
    nw = len(weights)
    grid = (N // block_n,)
    w_specs = [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM) for w in weights]
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
    dw_specs = [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                             memory_space=pltpu.VMEM) for w in weights]
    dx, *dws = pl.pallas_call(
        functools.partial(_bwd_kernel, arch, cdt, nw),
        out_shape=[jax.ShapeDtypeStruct((N, x.shape[1]), jnp.float32)] + dw_shapes,
        grid=grid,
        in_specs=[pl.BlockSpec((block_n, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_n, g.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=[pl.BlockSpec((block_n, x.shape[1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] + dw_specs,
        interpret=_interpret(),
    )(xp, gp, *weights)
    return dx[:n], tuple(dws)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def nerf_mlp_pallas(params: dict, x: jnp.ndarray, *, D: int, in_xyz: int,
                    in_dir: int, skips: Sequence[int] = (4,),
                    raw_feat: bool, sigma_only: bool = False,
                    block_n: int = 2048, block_bwd: int = 512,
                    compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Drop-in for nets.NeRFMLP.apply on TPU (training hot path).

    params: the flax param dict of one NeRFMLP. x: [..., C]. Matches
    NeRFMLP.__call__ semantics (nets.py:50-73): raw_feat returns the raw
    rgb branch; otherwise sigmoid(rgb)|sigma concat; sigma_only returns
    just sigma.
    """
    weights = flatten_params(params, D)
    lead = x.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(n, x.shape[-1])
    arch = (D, in_xyz, in_dir, tuple(skips))
    bn = min(block_n, max(256, 1 << (n - 1).bit_length()))
    bb = min(block_bwd, bn)
    out = fused_mlp(x2, weights, arch, bn, bb, compute_dtype)
    out_ch = weights[-2].shape[1]
    if sigma_only:
        return out[:, out_ch:].reshape(lead + (1,))
    rgb = out[:, :out_ch]
    sigma = out[:, out_ch:]
    if raw_feat:
        return rgb.reshape(lead + (out_ch,))
    rgb = jax.nn.sigmoid(rgb)
    return jnp.concatenate([rgb, sigma], -1).reshape(lead + (out_ch + 1,))
