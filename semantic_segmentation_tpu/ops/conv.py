"""Convolution primitives with the reference's (PyTorch) shape semantics,
expressed directly on ``lax.conv_general_dilated`` in TPU-native NHWC/HWIO
layouts.

``conv_transpose2d`` reproduces ``torch.nn.ConvTranspose2d(k, stride=s,
padding=p)`` exactly as the gradient-of-conv: input dilation ``s``, symmetric
padding ``k - 1 - p``, stride 1. The kernel stored here is the *equivalent
forward-conv kernel* (spatially flipped relative to torch's), which keeps the
hot path a single plain convolution on the MXU; checkpoint-porting transforms
handle the flip.
"""

from __future__ import annotations

from itertools import product
from typing import Sequence

import jax.numpy as jnp
from jax import lax

_DN_2D = ("NHWC", "HWIO", "NHWC")
_DN_3D = ("NDHWC", "DHWIO", "NDHWC")


def _dn(ndim_spatial: int):
    return _DN_2D if ndim_spatial == 2 else _DN_3D


def conv_nd(x, w_hwio, b=None, stride=1, padding=0, compute_dtype=None):
    """Plain strided conv. ``padding`` is the torch-style symmetric pad (int or
    per-dim sequence)."""
    nsp = w_hwio.ndim - 2
    strides = (stride,) * nsp if isinstance(stride, int) else tuple(stride)
    pads = (padding,) * nsp if isinstance(padding, int) else tuple(padding)
    if compute_dtype is not None:
        x, w_hwio = x.astype(compute_dtype), w_hwio.astype(compute_dtype)
    y = lax.conv_general_dilated(
        x, w_hwio, window_strides=strides,
        padding=[(p, p) for p in pads],
        dimension_numbers=_dn(nsp),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


_PACKED_TRANSPOSE = False
# default ON since the real-v5e in-program A/B (scripts/ab_lowerings.py):
# with the reshape pool, 19.85 -> 20.20 it/s on the flagship iteration
_TAPMM_HEAD = True
_TAPMM_DOWN = False


def use_tapmm_down(enable: bool) -> None:
    """Process-wide switch (cfg.model.tapmm_down): route eligible k4-s2-p1
    down-convs through the per-tap matmul lowering (conv_down_tapmm). A
    build-time compilation choice, not training state — same math to
    accumulation-order rounding."""
    global _TAPMM_DOWN
    _TAPMM_DOWN = bool(enable)


def _shift2d(p, dr: int, dc: int):
    """p'[(i, j)] = p[(i+dr, j+dc)] with zero fill (dr, dc in {-1, 0, 1})."""
    B, H, W, C = p.shape
    p = jnp.pad(p, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return lax.dynamic_slice(p, (0, 1 + dr, 1 + dc, 0), (B, H, W, C))


def conv_down_tapmm(x, w_hwio, b=None, compute_dtype=None):
    """``Conv2d(k=4, stride=2, padding=1)`` as 16 dense per-tap matmuls
    over the 2x2 phase-split input — no conv primitive at all: input index
    (2i+dy-1, 2j+dx-1) = phase ((dy-1)%2, (dx-1)%2) shifted by
    ((dy-1)//2, (dx-1)//2), each tap one (B*Ho*Wo, C) @ (C, Cout) einsum
    with f32 accumulation.

    Measured on v5e at the flagship layer shapes
    (scripts/bench_conv_down.py, two-point-slope timing): 1.6-2.2x faster
    than XLA's strided conv fwd+bwd for H_in >= 32 and C_in >= 64 (G_d2:
    301 -> 141 us, D_c1: 300 -> 138 us; the bwd gain is the strided dgrad
    that XLA lowers through input dilation). XLA stays faster for tiny
    spatial (<= 16^2 inputs) and tiny channel counts, hence the dispatch
    gate in down_conv4."""
    if compute_dtype is not None:
        x, w_hwio = x.astype(compute_dtype), w_hwio.astype(compute_dtype)
    B, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    c_out = w_hwio.shape[-1]
    xp = x.reshape(B, Ho, 2, Wo, 2, C)
    acc = jnp.zeros((B, Ho, Wo, c_out), jnp.float32)
    for dy in range(4):
        r, orr = (dy - 1) % 2, (dy - 1) // 2
        for dx in range(4):
            c, occ = (dx - 1) % 2, (dx - 1) // 2
            ph = xp[:, :, r, :, c, :]
            if orr or occ:
                ph = _shift2d(ph, orr, occ)
            acc = acc + jnp.einsum("bhwc,cf->bhwf", ph, w_hwio[dy, dx],
                                   preferred_element_type=jnp.float32)
    y = acc.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def down_conv4(x, w_hwio, b=None, compute_dtype=None):
    """The k4-s2-p1 down-conv with a shape-dispatched lowering: the
    per-tap matmul form where it measured faster (H_in >= 32, C_in >= 64 —
    see conv_down_tapmm), XLA's conv otherwise. Gated by use_tapmm_down."""
    if _TAPMM_DOWN and x.shape[1] >= 32 and x.shape[-1] >= 64:
        return conv_down_tapmm(x, w_hwio, b, compute_dtype)
    return conv_nd(x, w_hwio, b, stride=2, padding=1,
                   compute_dtype=compute_dtype)


def use_packed_transpose(enable: bool) -> None:
    """Process-wide switch (cfg.model.convt_packed): route eligible
    conv_transpose_nd calls through the phase-packed lowering. A build-time
    compilation choice, not training state — same math either way."""
    global _PACKED_TRANSPOSE
    _PACKED_TRANSPOSE = bool(enable)


def use_tapmm_head(enable: bool) -> None:
    """Process-wide switch: route tiny-C_out 2D transposed convs (the
    generator's 1-channel head) through the tap-unrolled matmul lowering
    instead of phase packing. Same math; a compilation choice."""
    global _TAPMM_HEAD
    _TAPMM_HEAD = bool(enable)


def conv_transpose_nd(x, w_hwio, b=None, stride=2, torch_padding=1,
                      output_padding=0, compute_dtype=None):
    """``ConvTranspose(k, stride, padding=p, output_padding=op)`` with torch
    output-size semantics: out = (in - 1) * stride - 2p + k + op. ``w_hwio``
    is the equivalent forward-conv kernel (already flipped), shape
    (*k, C_in, C_out); output_padding extends the high side."""
    nsp = w_hwio.ndim - 2
    ks: Sequence[int] = w_hwio.shape[:nsp]
    strides = (stride,) * nsp if isinstance(stride, int) else tuple(stride)
    pads = ((torch_padding,) * nsp if isinstance(torch_padding, int)
            else tuple(torch_padding))
    opads = ((output_padding,) * nsp if isinstance(output_padding, int)
             else tuple(output_padding))
    # Shape-dependent dispatch, from the real-v5e A/B at the unet_256
    # generator's layer shapes (scripts/bench_convt.py, fwd and fwd+bwd):
    # packing wins exactly where C_out underfills the 128 MXU output lanes —
    # 3.6x/3.5x at the 128->1 outermost upconv, 1.8x/1.7x at 256->64,
    # 1.2x/0.94x at 512->128 — and loses at the deep high-channel layers
    # (0.83x/0.67x at C_out=256, 0.84x/0.38x at C_out=512) where the extra
    # slice/interleave traffic outweighs nothing (lanes already full).
    # Geometry guard: the packed interleave always emits in*s per axis, which
    # equals torch's (in-1)*s - 2p + k only when k - 2p == s (true for every
    # layer family in this repo: k4p1/k6p2/k8p3 at s2, k2p0 at s2).
    if (_PACKED_TRANSPOSE and not any(opads)
            and all(k - 2 * p == st for k, p, st in zip(ks, pads, strides))
            and w_hwio.shape[-1] <= 128):
        if (_TAPMM_HEAD and nsp == 2
                and all(k % st == 0 for k, st in zip(ks, strides))
                and (ks[0] // strides[0]) * (ks[1] // strides[1])
                * strides[0] * strides[1] * w_hwio.shape[-1] <= 128):
            return conv_transpose_2d_tapmm(x, w_hwio, b, stride,
                                           torch_padding,
                                           compute_dtype=compute_dtype)
        return conv_transpose_nd_packed(x, w_hwio, b, stride, torch_padding,
                                        compute_dtype=compute_dtype)
    return _conv_transpose_dilated(x, w_hwio, b, strides, pads, opads,
                                   compute_dtype)


def _conv_transpose_dilated(x, w_hwio, b, strides, pads, opads,
                            compute_dtype):
    nsp = w_hwio.ndim - 2
    ks = w_hwio.shape[:nsp]
    if compute_dtype is not None:
        x, w_hwio = x.astype(compute_dtype), w_hwio.astype(compute_dtype)
    y = lax.conv_general_dilated(
        x, w_hwio, window_strides=(1,) * nsp,
        padding=[(k - 1 - p, k - 1 - p + op)
                 for k, p, op in zip(ks, pads, opads)],
        lhs_dilation=strides,
        dimension_numbers=_dn(nsp),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose_2d_tapmm(x, w_hwio, b=None, stride=2, torch_padding=3,
                            compute_dtype=None):
    """Tap-unrolled lowering for TINY-C_out 2D transposed convs (the
    generator's outermost NAS upconv: concat-128 -> output_nc=1, k8 s2,
    128^2 -> 256^2, networks.py:486-511 head).

    Even phase-packed (s^2 * C_out = 4 lanes), the op runs ~100x over its
    bandwidth floor: 4 of 128 MXU output lanes. Here the channel contraction
    becomes ONE full-width matmul — Y[n,i,j,(ty,tx,p,c)] = x_pad @ W with
    taps*phases*C_out output lanes (64 for the head) — and the tap
    reduction is s^2 * (k/s)^2 shifted slice-adds of small C_out planes,
    followed by the same phase interleave as the packed form. Same math
    (identical tap sums) to accumulation-order rounding. Eligible when
    k - 2p == s, s | k, and (k/s)^2 * s^2 * C_out <= 128."""
    nsp = 2
    ks: Sequence[int] = w_hwio.shape[:nsp]
    s = (stride,) * nsp if isinstance(stride, int) else tuple(stride)
    pads = ((torch_padding,) * nsp if isinstance(torch_padding, int)
            else tuple(torch_padding))
    qs = [k - 1 - p for k, p in zip(ks, pads)]
    if compute_dtype is not None:
        x, w_hwio = x.astype(compute_dtype), w_hwio.astype(compute_dtype)
    cin, cout = w_hwio.shape[-2], w_hwio.shape[-1]
    sp_in = x.shape[1:-1]

    phases = list(product(*(range(si) for si in s)))
    ws = [w_hwio[tuple(slice((q - r) % si, None, si)
                       for q, r, si in zip(qs, phases[i], s))]
          for i in range(len(phases))]
    offs = [tuple((q - r) // si for q, r, si in zip(qs, ph, s))
            for ph in phases]
    t0 = ws[0].shape[:nsp]
    plo = [max(o[d] for o in offs) for d in range(nsp)]
    phi = [t0[d] - 1 - min(o[d] for o in offs) for d in range(nsp)]

    # one matmul over channels: lanes = (ty, tx, phase, cout), tap-major so
    # each tap's slice-add reads a CONTIGUOUS len(phases)*cout lane block
    wstack = jnp.stack(ws, axis=-2)                    # (ty, tx, cin, P, co)
    w2 = jnp.transpose(wstack, (2, 0, 1, 3, 4)).reshape(
        cin, t0[0] * t0[1] * len(phases) * cout)
    x_pad = jnp.pad(x, [(0, 0), (plo[0], phi[0]), (plo[1], phi[1]), (0, 0)])
    y = jnp.einsum("nhwc,ck->nhwk", x_pad, w2)         # (n, Hp, Wp, T*P*co)

    pc = len(phases) * cout
    grids = {}
    for i, (ph, off) in enumerate(zip(phases, offs)):
        b0, b1 = plo[0] - off[0], plo[1] - off[1]
        acc = None
        for ty in range(t0[0]):
            for tx in range(t0[1]):
                lane = ((ty * t0[1]) + tx) * pc + i * cout
                sl = y[:, b0 + ty:b0 + ty + sp_in[0],
                       b1 + tx:b1 + tx + sp_in[1], lane:lane + cout]
                acc = sl if acc is None else acc + sl
        grids[ph] = acc
    for ax in range(nsp - 1, -1, -1):
        new = {}
        for head in product(*(range(si) for si in s[:ax])):
            parts = [grids[head + (r,)] for r in range(s[ax])]
            st = jnp.stack(parts, axis=ax + 2)
            new[head] = st.reshape(
                st.shape[:ax + 1] + (st.shape[ax + 1] * s[ax],)
                + st.shape[ax + 3:])
        grids = new
    out = grids[()]
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_transpose_nd_packed(x, w_hwio, b=None, stride=2, torch_padding=1,
                             compute_dtype=None):
    """``conv_transpose_nd`` as ONE dense stride-1 conv computing all s^nd
    output phases at once (s^nd * C_out output channels), then per-phase
    shifted slices interleaved back.

    Why: XLA lowers lhs-dilated convs by materializing the hole pattern; at
    the generator's OUTERMOST upconv (C_out=1, k8 s2, 128^2 -> 256^2) the
    device trace shows 6-9 GB/s / ~0.76 TFLOP/s — the single worst op of
    the flagship engine iteration (3.85 ms across its three netG forwards).
    Packing the s^2 phases into channels gives the MXU s^2 * C_out output
    lanes and a dense stride-1 window. Same math (per-phase kernels are
    disjoint slices of w; each output element is the identical tap sum), so
    results differ from the dilated form only by accumulation-order
    rounding. Requires output_padding=0 and stride dividing nothing in
    particular — any k, p with k - 1 - p >= 0.
    """
    nsp = w_hwio.ndim - 2
    ks: Sequence[int] = w_hwio.shape[:nsp]
    s = (stride,) * nsp if isinstance(stride, int) else tuple(stride)
    pads = ((torch_padding,) * nsp if isinstance(torch_padding, int)
            else tuple(torch_padding))
    qs = [k - 1 - p for k, p in zip(ks, pads)]
    assert all(q >= 0 for q in qs), (ks, pads)
    if compute_dtype is not None:
        x, w_hwio = x.astype(compute_dtype), w_hwio.astype(compute_dtype)
    cout = w_hwio.shape[-1]
    sp_in = x.shape[1:-1]

    # per-phase kernels (disjoint tap slices of w) and output shifts
    phases = list(product(*(range(si) for si in s)))
    ws, offs = [], []
    for ph in phases:
        idx = tuple(slice((q - r) % si, None, si)
                    for q, r, si in zip(qs, ph, s))
        ws.append(w_hwio[idx])
        offs.append(tuple((q - r) // si for q, r, si in zip(qs, ph, s)))
    # equal tap counts per phase require s | k (true for the NAS kernel
    # table: k 4/6/8 at s2), and the in*s interleaved output matches torch's
    # size only when k - 2p == s; fall back to the dilated form otherwise
    t0 = ws[0].shape[:nsp]
    if (any(w.shape[:nsp] != t0 for w in ws)
            or any(k - 2 * p != si for k, p, si in zip(ks, pads, s))):
        return _conv_transpose_dilated(x, w_hwio, b, s, pads, (0,) * nsp,
                                       None)
    wp = jnp.concatenate(ws, axis=-1)            # (*T, Cin, s^nd * Cout)
    plo = [max(o[d] for o in offs) for d in range(nsp)]
    phi = [t0[d] - 1 - min(o[d] for o in offs) for d in range(nsp)]
    y = lax.conv_general_dilated(
        x, wp, window_strides=(1,) * nsp,
        padding=list(zip(plo, phi)),
        dimension_numbers=_dn(nsp),
    )
    # slice each phase's shifted window, then interleave axis by axis
    grids = {}
    for i, (ph, off) in enumerate(zip(phases, offs)):
        idx = (slice(None),) + tuple(
            slice(plo[d] - off[d], plo[d] - off[d] + sp_in[d])
            for d in range(nsp)) + (slice(i * cout, (i + 1) * cout),)
        grids[ph] = y[idx]
    for ax in range(nsp - 1, -1, -1):
        new = {}
        for head in product(*(range(si) for si in s[:ax])):
            parts = [grids[head + (r,)] for r in range(s[ax])]
            st = jnp.stack(parts, axis=ax + 2)
            new[head] = st.reshape(
                st.shape[:ax + 1] + (st.shape[ax + 1] * s[ax],)
                + st.shape[ax + 3:])
        grids = new
    out = grids[()]
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
