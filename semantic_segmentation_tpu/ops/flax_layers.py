"""Small flax building blocks with the reference's (torch) numerics:
torch-default initializers, torch-semantics transposed conv, batch norm with
torch momentum/eps.

Compute dtype discipline: modules take a ``dtype`` (bf16 on TPU by default at
the model level) while parameters stay float32 — the TPU-native replacement
for the reference's AMP autocast/GradScaler (``train_end2end_jsrt.py:75``).
"""

from __future__ import annotations

import math
from functools import partial
from itertools import product
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from semantic_segmentation_tpu.ops.conv import conv_transpose_nd


def torch_kaiming_uniform(scale_via_fan_in: bool = True):
    """torch nn.Conv2d default weight init: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = C_in * prod(kernel)."""

    def init(key, shape, dtype=jnp.float32):
        # HWIO: fan_in = prod(spatial) * C_in
        fan_in = math.prod(shape[:-1])
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_uniform(fan_in: int):
    """torch conv bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def pix2pix_normal_init(gain: float = 0.02):
    """init_type='normal' of ``models_pix2pix/networks.py:84-98``."""
    return nn.initializers.normal(stddev=gain)


def _semi_orthogonal(key, rows: int, cols: int, gain: float):
    """torch ``init.orthogonal_`` law on a (rows, cols) flattened weight:
    QR of a Gaussian (transposed when rows < cols so the SHORT side is
    orthonormal), sign-corrected by diag(R), scaled by gain."""
    tall = rows >= cols
    a = jax.random.normal(key, (rows, cols) if tall else (cols, rows))
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    return gain * (q if tall else q.T)


def reinit_params(key, params, init_type: str = "normal",
                  init_gain: float = 0.02,
                  transposed_re: str = r"up\d+$"):
    """``init_weights`` (models_pix2pix/networks.py:73-104) as a pure pass
    over an already-constructed params pytree — the functional analogue of
    torch's post-hoc ``net.apply(init_func)``.

    Laws (torch ``nn.init`` semantics on our HWIO kernels, receptive field
    rf = prod(spatial), I/O the last two axes):
      - normal:     N(0, init_gain)
      - xavier:     ``xavier_normal_(gain)`` -> N(0, gain*sqrt(2/(rf*I+rf*O)))
      - kaiming:    ``kaiming_normal_(a=0, mode='fan_in')`` -> N(0, sqrt(2/fan));
                    torch computes fan from tensor dim 1, so for a
                    ConvTranspose (IOHW weight) fan = rf*O, not rf*I — modules
                    whose name matches ``transposed_re`` get that law
      - orthogonal: ``orthogonal_(gain)`` on the (dim0, rest) flattening —
                    rows = O for a conv, rows = I for a transposed conv
    Biases of conv/dense params go to 0; BatchNorm ``scale`` is re-drawn
    N(1, init_gain) and its ``bias`` zeroed (init_func's BatchNorm2d branch).
    InstanceNorm carries no params (affine=False), matching the reference.
    """
    import re
    if init_type == "normal":
        law = lambda k, s, tr: init_gain * jax.random.normal(k, s)
    elif init_type == "xavier":
        def law(k, s, tr):
            rf = math.prod(s[:-2])
            std = init_gain * math.sqrt(2.0 / (rf * s[-2] + rf * s[-1]))
            return std * jax.random.normal(k, s)
    elif init_type == "kaiming":
        def law(k, s, tr):
            rf = math.prod(s[:-2])
            fan = rf * (s[-1] if tr else s[-2])
            return math.sqrt(2.0 / fan) * jax.random.normal(k, s)
    elif init_type == "orthogonal":
        def law(k, s, tr):
            rf = math.prod(s[:-2])
            if tr:  # rows = I (torch IOHW dim 0)
                a = _semi_orthogonal(k, s[-2], rf * s[-1], init_gain)
                a = a.reshape((s[-2],) + s[:-2] + (s[-1],))
                return jnp.moveaxis(a, 0, -2)
            a = _semi_orthogonal(k, s[-1], rf * s[-2], init_gain)
            a = a.reshape((s[-1],) + s[:-2] + (s[-2],))
            return jnp.moveaxis(a, 0, -1)
    else:
        raise NotImplementedError(init_type)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    n_kernels = sum(1 for p, _ in flat
                    if str(p[-1].key).startswith("kernel"))
    keys = iter(jax.random.split(key, max(n_kernels, 1)))
    pat = re.compile(transposed_re)
    out = []
    for path, leaf in flat:
        name = str(path[-1].key)
        parent = str(path[-2].key) if len(path) > 1 else ""
        if name.startswith("kernel") and leaf.ndim >= 2:
            tr = bool(pat.search(parent))
            out.append(law(next(keys), leaf.shape, tr).astype(leaf.dtype))
        elif name == "scale":   # BatchNorm affine weight
            out.append((1.0 + init_gain * jax.random.normal(
                jax.random.fold_in(key, len(out)), leaf.shape)
            ).astype(leaf.dtype))
        elif name.startswith("bias"):
            out.append(jnp.zeros_like(leaf))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


class DownConv4(nn.Module):
    """Drop-in for ``nn.Conv(features, (4, 4), strides=2, padding=1)``
    (the generator/discriminator down-convs, reference networks.py:582,
    :620-665) with a dispatchable lowering: XLA's strided conv, or the
    per-tap matmul form where it measured 1.6-2.2x faster on v5e
    (ops/conv.down_conv4, gated by cfg.model.tapmm_down). Identical param
    names/shapes/init to nn.Conv, so checkpoints and torch ports are
    unaffected."""
    features: int
    use_bias: bool = True
    kernel_init: Callable = None  # type: ignore[assignment]
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from semantic_segmentation_tpu.ops.conv import down_conv4
        kernel = self.param("kernel", self.kernel_init,
                            (4, 4, x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return down_conv4(x, kernel, bias, compute_dtype=self.dtype)


class TorchConvTranspose(nn.Module):
    """``nn.ConvTranspose2d/3d(k, stride, padding)`` with torch output-size
    semantics; kernel stored as the forward-equivalent (flipped) HWIO tensor."""
    features: int
    kernel_size: int
    stride: int = 2
    torch_padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    ndim_spatial: int = 2
    kernel_init: Callable = None  # type: ignore[assignment]
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kshape = (self.kernel_size,) * self.ndim_spatial + (c_in, self.features)
        kinit = self.kernel_init or torch_kaiming_uniform()
        kernel = self.param("kernel", kinit, kshape)
        bias = None
        if self.use_bias:
            fan_in = c_in * self.kernel_size ** self.ndim_spatial
            bias = self.param("bias", torch_bias_uniform(fan_in), (self.features,))
        return conv_transpose_nd(x, kernel, bias, stride=self.stride,
                                 torch_padding=self.torch_padding,
                                 output_padding=self.output_padding,
                                 compute_dtype=self.dtype)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch defaults (momentum 0.1 -> flax 0.9, eps 1e-5).
    ``use_running_average`` is threaded by the caller (train vs eval)."""
    use_running_average: bool = True
    dtype: Any = None
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = nn.merge_param("use_running_average", self.use_running_average
                             if use_running_average is None else use_running_average,
                             use_running_average)
        return nn.BatchNorm(
            use_running_average=ura, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, scale_init=self.scale_init,
            bias_init=self.bias_init, name="bn")(x)


def max_pool_2x(x, ndim_spatial: int = 2):
    """torch nn.MaxPool2d(2) / MaxPool3d(2) with a scatter-free backward.

    XLA differentiates reduce_window-max through ``select-and-scatter``,
    which runs at ~67 GB/s on TPU (measured: 3.8% of the flagship engine
    iteration). For NON-OVERLAPPING 2x windows the same gradient — route
    everything to the first window position attaining the max, in row-major
    kernel order, which is both torch's argmax semantics and
    select-and-scatter's first-true-select semantics — is a pure elementwise
    expression over the window view: ``eq & (cumsum(eq) == 1)``. Equality
    and max are exact ops, so the gradient is BIT-IDENTICAL to the
    select-and-scatter result (tested against jax's own max_pool grad)."""
    return _max_pool_2x(x, ndim_spatial)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_2x(x, nd: int):
    return _pool_fwd(x, nd)[0]


# default ON since the real-v5e in-program A/B (scripts/ab_lowerings.py):
# 19.48 -> 19.84 it/s on the flagship engine iteration, bit-identical
_RESHAPE_POOL_2D = True


def use_reshape_pool(enable: bool) -> None:
    """Process-wide lowering switch for the 2D pool: the strided-slice window
    view forces per-phase sublane relayouts on TPU (the [.,16,33,.] padded
    copies in the engine trace, ~2 ms/iter); the in-place (n,H,2,W,2,C)
    reshape view is layout-free (splits each spatial axis in place, channel
    minor untouched). Same values and same first-argmax gradient either way
    (bit-tested); a compilation choice, not state. 2D only — the 3D pool
    keeps slices so depth-axis spatial sharding (parallel/spatial.py) can
    propagate through it."""
    global _RESHAPE_POOL_2D
    _RESHAPE_POOL_2D = bool(enable)


def _trim_even(x, nd: int):
    sp = x.shape[1:-1]
    ev = tuple(d - d % 2 for d in sp)
    return x[(slice(None),) + tuple(slice(0, e) for e in ev)
             + (slice(None),)], ev


def _window6(x, nd: int):
    """(n, 2H, 2W, c) -> (n, H, 2, W, 2, c), a free in-place reshape.
    One axis split per reshape: GSPMD sharding-in-types propagates
    single-axis splits but rejects multi-axis ones (batch-sharded DP)."""
    xs, ev = _trim_even(x, nd)
    n, c = xs.shape[0], xs.shape[-1]
    x5 = xs.reshape(n, ev[0] // 2, 2, ev[1], c)
    return x5.reshape(n, ev[0] // 2, 2, ev[1] // 2, 2, c), ev


def _pool_fwd_reshape(x, nd: int):
    x6, _ = _window6(x, nd)
    y = jnp.max(x6, axis=(2, 4))
    return y, (x, y)


def _pool_bwd_reshape(nd: int, res, g):
    x, y = res
    x6, ev = _window6(x, nd)
    eq = x6 == y[:, :, None, :, None, :]
    # row-major first-argmax priority over (h2, w2) — identical semantics to
    # the slice path (torch argmax / select-and-scatter first-true)
    e00, e01 = eq[:, :, 0, :, 0, :], eq[:, :, 0, :, 1, :]
    e10, e11 = eq[:, :, 1, :, 0, :], eq[:, :, 1, :, 1, :]
    m01 = e01 & ~e00
    m10 = e10 & ~(e00 | e01)
    m11 = e11 & ~(e00 | e01 | e10)
    z = jnp.zeros((), g.dtype)
    w = [jnp.where(m, g, z) for m in (e00, m01, m10, m11)]
    dx6 = jnp.stack([jnp.stack([w[0], w[1]], axis=3),
                     jnp.stack([w[2], w[3]], axis=3)], axis=2)
    n, c = x.shape[0], x.shape[-1]
    dx = dx6.reshape(n, ev[0] // 2, 2, ev[1], c).reshape(n, ev[0], ev[1], c)
    pads = [(0, 0)] + [(0, d - e) for d, e in zip(x.shape[1:-1], ev)] \
        + [(0, 0)]
    return (jnp.pad(dx, pads),)


def _window_slices(x, nd: int):
    """Trim odd edges (torch floor semantics) and return the 2^nd strided
    window slices in row-major kernel order. Slices (unlike a multi-axis
    window reshape) are transparent to GSPMD sharding propagation, so the
    pool composes with batch-sharded data-parallel steps."""
    sp = x.shape[1:-1]
    ev = tuple(d - d % 2 for d in sp)
    xs = x[(slice(None),) + tuple(slice(0, e) for e in ev) + (slice(None),)]
    slices = []
    for offs in product((0, 1), repeat=nd):
        idx = (slice(None),) + tuple(slice(o, None, 2) for o in offs) \
            + (slice(None),)
        slices.append(xs[idx])
    return slices


def _pool_fwd(x, nd: int):
    if nd == 2 and _RESHAPE_POOL_2D:
        return _pool_fwd_reshape(x, nd)
    slices = _window_slices(x, nd)
    y = slices[0]
    for s in slices[1:]:
        y = jnp.maximum(y, s)
    return y, (x, y)


def _interleave2(a, b, axis: int):
    """(…, L, …) x2 -> (…, 2L, …) interleaved; stack + single-pair merge
    keeps every reshape to one axis group (GSPMD-safe)."""
    st = jnp.stack([a, b], axis=axis + 1)
    return st.reshape(st.shape[:axis] + (st.shape[axis] * 2,)
                      + st.shape[axis + 2:])


def _pool_bwd(nd: int, res, g):
    if nd == 2 and _RESHAPE_POOL_2D:
        return _pool_bwd_reshape(nd, res, g)
    x, y = res
    slices = _window_slices(x, nd)
    taken = jnp.zeros(y.shape, jnp.bool_)
    masked = []
    for s in slices:  # row-major first-argmax priority (torch semantics)
        eq = (s == y) & ~taken
        taken = taken | eq
        masked.append(jnp.where(eq, g, jnp.zeros((), g.dtype)))
    # interleave the 2^nd phase grids back, innermost spatial axis first
    grids = {offs: m for offs, m in zip(product((0, 1), repeat=nd), masked)}
    for ax in range(nd - 1, -1, -1):
        new = {}
        for offs in product((0, 1), repeat=ax):
            new[offs] = _interleave2(grids[offs + (0,)], grids[offs + (1,)],
                                     axis=1 + ax)
        grids = new
    dxs = grids[()]
    # zero-pad the trimmed odd edges back (their gradient is zero)
    ev = dxs.shape[1:-1]
    pads = [(0, 0)] + [(0, d - e) for d, e in zip(x.shape[1:-1], ev)] \
        + [(0, 0)]
    return (jnp.pad(dxs, pads),)


_max_pool_2x.defvjp(_pool_fwd, _pool_bwd)


def pad_to_match(x_small, target_spatial: Sequence[int]):
    """The U-Net skip-concat pad (unet/unet_parts.py:59-63): pad the upsampled
    tensor symmetrically (extra pixel goes to the high side) to the skip's
    spatial shape. NHWC / NDHWC."""
    pads = [(0, 0)]
    for dim, tgt in zip(x_small.shape[1:-1], target_spatial):
        diff = tgt - dim
        pads.append((diff // 2, diff - diff // 2))
    pads.append((0, 0))
    return jnp.pad(x_small, pads)


def resize_bilinear_align_corners(x, out_h: int, out_w: int):
    """torch ``F.interpolate(mode='bilinear', align_corners=True)`` to an
    arbitrary size, NHWC. jax.image.resize has no align_corners mode;
    implement it by explicit linear interpolation on the corner-aligned grid
    (sample positions ``o * (in-1)/(out-1)``)."""
    n, h, w, c = x.shape

    def grid(in_size, out_size):
        if in_size == 1:
            return jnp.zeros((out_size,)), jnp.zeros((out_size,), jnp.int32), \
                jnp.zeros((out_size,), jnp.int32)
        pos = jnp.arange(out_size) * (in_size - 1) / (out_size - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        return pos - lo, lo, hi

    fy, y0, y1 = grid(h, out_h)
    fx, x0, x1 = grid(w, out_w)
    top = x[:, y0][:, :, x0] * (1 - fx)[None, None, :, None] + \
        x[:, y0][:, :, x1] * fx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - fx)[None, None, :, None] + \
        x[:, y1][:, :, x1] * fx[None, None, :, None]
    return top * (1 - fy)[None, :, None, None] + bot * fy[None, :, None, None]


def upsample_bilinear_2x(x, align_corners: bool = True):
    """torch nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)."""
    n, h, w, c = x.shape
    return resize_bilinear_align_corners(x, 2 * h, 2 * w)
