"""Attack the conv ceiling (VERDICT r3 item 4): is XLA's k4-stride-2
lowering leaving throughput on the table for the flagship conv mix?

PERF.md's traces put the convolution category at 320-400 GB/s achieved (vs
819 peak HBM) and 2.8% MXU at batch 8 — the claim "layout/tiling overheads,
regime not kernels" was asserted from the trace but never tested against an
alternative lowering. This script A/Bs, at the REAL layer shapes of the
flagship program (every k4s2p1 down-conv of the unet_256 generator at
ngf=64 and the PatchGAN discriminator at ndf=64, scripts/
train_end2end_jsrt.sh regime, reference networks.py:582 + :620-665):

  xla    — lax.conv_general_dilated, NHWC/HWIO (what flax emits today)
  tapmm  — phase-split input + 16 dense stride-1 matmul-accumulates
           (one einsum per tap; no conv primitive at all)
  pallas — implicit-GEMM Pallas kernel: per grid row-block, build the
           (rows*Wo, 16*Cin) patch matrix in VMEM from shifted phase
           copies and run ONE MXU matmul against the (16*Cin, Cout)
           reshaped kernel

fwd and fwd+bwd (where applicable), bf16 compute / f32 accumulate, batch
from the shipped preset. Prints one JSON line per (layer, form) plus a
weighted summary and the roofline bound per layer
(max(bytes/819e9, flops/197e12)).

Run on TPU: python scripts/bench_conv_down.py [--fast]
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

from semantic_segmentation_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

S = 50      # inner iterations per timed call (scanned on device)
REPS = 3

# (tag, H=W, C_in, C_out) — every k4s2p1 conv in the flagship engine
# iteration. G downs run 3x per iteration (netG fwd + netD's G fwd + unet
# problem's G fwd) with 1-2 backwards; D stack runs 2-3x. The `weight`
# column approximates per-iteration multiplicity for the summary.
LAYERS = [
    ("G_d1",  256,   1,  64, 3.0),
    ("G_d2",  128,  64, 128, 3.0),
    ("G_d3",   64, 128, 256, 3.0),
    ("G_d4",   32, 256, 512, 3.0),
    ("G_d5",   16, 512, 512, 3.0),
    ("G_d6",    8, 512, 512, 3.0),
    ("G_d7",    4, 512, 512, 3.0),
    ("G_d8",    2, 512, 512, 3.0),
    ("D_c0",  256,   2,  64, 2.0),
    ("D_c1",  128,  64, 128, 2.0),
    ("D_c2",   64, 128, 256, 2.0),
]

PEAK_BW = 819e9
PEAK_FLOPS = 197e12


def conv_xla(x, w, stride=2):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _shift2d(p, dr, dc):
    """p[(i,j)] <- p[(i+dr, j+dc)] with zero fill (dr, dc in {-1, 0, 1})."""
    B, H, W, C = p.shape
    p = jnp.pad(p, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return lax.dynamic_slice(p, (0, 1 + dr, 1 + dc, 0), (B, H, W, C))


def conv_tapmm(x, w):
    """k4 s2 p1 conv as 16 dense matmuls over the 2x2 phase-split input:
    input index (2i+dy-1, 2j+dx-1) = phase ((dy-1)%2, (dx-1)%2) shifted by
    ((dy-1)//2, (dx-1)//2). No conv primitive; pure MXU einsums."""
    B, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    Cout = w.shape[-1]
    xp = x.reshape(B, Ho, 2, Wo, 2, C)
    acc = jnp.zeros((B, Ho, Wo, Cout), jnp.float32)
    for dy in range(4):
        r, orr = (dy - 1) % 2, (dy - 1) // 2
        for dx in range(4):
            c, occ = (dx - 1) % 2, (dx - 1) // 2
            ph = xp[:, :, r, :, c, :]
            if orr or occ:
                ph = _shift2d(ph, orr, occ)
            acc = acc + jnp.einsum("bhwc,cf->bhwf", ph, w[dy, dx],
                                   preferred_element_type=jnp.float32)
    return acc


def conv_pallas(x, w, row_block=None):
    """Implicit-GEMM Pallas kernel. Grid over (batch, output-row blocks);
    each step DMAs the needed phase rows (incl. the 1-row halo each side,
    pre-padded outside so the slice is static-safe) from HBM to a VMEM
    scratch, assembles the (row_block*Wo, 16*Cin) patch matrix from shifted
    phase slices, and runs ONE MXU matmul against the (16*Cin, Cout)
    reshaped kernel (resident in VMEM across the grid)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    Cout = w.shape[-1]
    if row_block is None:
        # target <=2 MB patch matrix in VMEM
        row_block = max(1, min(Ho, 2**21 // max(1, Wo * 16 * C * 2)))
        while Ho % row_block:
            row_block -= 1
    wm = w.reshape(16 * C, Cout)

    # pre-pad one phase-row/col of zeros on each side: padded phase row i+1
    # = input rows (2i, 2i+1); output row block [i0, i0+rb) needs padded
    # phase rows [i0, i0+rb+2) and all (padded) cols.
    xp = x.reshape(B, Ho, 2, Wo, 2, C)
    xp = jnp.pad(xp, ((0, 0), (1, 1), (0, 0), (1, 1), (0, 0), (0, 0)))

    def kernel(xr, wr, out):
        i = pl.program_id(1)

        def body(scratch, sem):
            dma = pltpu.make_async_copy(
                xr.at[0, pl.ds(i * row_block, row_block + 2)], scratch, sem)
            dma.start()
            dma.wait()
            taps = []
            for dy in range(4):
                r, orr = (dy - 1) % 2, (dy - 1) // 2
                for dx in range(4):
                    c, occ = (dx - 1) % 2, (dx - 1) // 2
                    taps.append(scratch[1 + orr:1 + orr + row_block, r,
                                        1 + occ:1 + occ + Wo, c, :])
            patch = jnp.concatenate(
                [t.reshape(row_block * Wo, C) for t in taps], axis=1)
            out[0] = jnp.dot(patch, wr[:],
                             preferred_element_type=jnp.float32).reshape(
                                 row_block, Wo, Cout)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((row_block + 2, 2, Wo + 2, 2, C), x.dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    grid = (B, Ho // row_block)
    return pl.pallas_call(
        kernel,
        grid=grid,
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, Ho + 2, 2, Wo + 2, 2, C),
                         lambda b, i: (b, 0, 0, 0, 0, 0),
                         memory_space=pltpu.ANY),
            pl.BlockSpec((16 * C, Cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_block, Wo, Cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), jnp.float32),
    )(xp, wm)


def timed(fn, x, w):
    """Median-of-REPS per-call time with S calls scanned ON DEVICE in one
    dispatch (the tunnel's ~2.7 ms dispatch latency would otherwise swamp
    these us-scale layers). A one-element feedback into x defeats
    loop-invariant hoisting without adding measurable work."""
    @jax.jit
    def many(x, w):
        def body(c, _):
            y = fn(x + c, w)
            return y.reshape(-1)[0].astype(x.dtype) * 1e-12, None
        c, _ = lax.scan(body, jnp.zeros((), x.dtype), None, length=S)
        return c

    out = many(x, w)
    jax.block_until_ready(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(many(x, w))
        times.append((time.perf_counter() - t0) / S)
    return sorted(times)[len(times) // 2]


def grad_form(conv):
    def gf(x, w):
        def loss(x, w):
            return jnp.sum(conv(x, w) ** 2)
        dx, dw = jax.grad(loss, argnums=(0, 1))(x, w)
        # fold dw into the output so neither gradient is dead code
        return dx + dw.reshape(-1)[0].astype(dx.dtype) * 1e-12
    return gf


def main():
    fast = "--fast" in sys.argv
    batch = 2
    rng = np.random.default_rng(0)
    rows = []
    for tag, hw, cin, cout, mult in LAYERS:
        if fast and hw < 16:
            continue
        x = jnp.asarray(rng.standard_normal((batch, hw, hw, cin)),
                        jnp.bfloat16)
        w = jnp.asarray(0.05 * rng.standard_normal((4, 4, cin, cout)),
                        jnp.bfloat16)
        flops = 2 * batch * (hw // 2) ** 2 * 16 * cin * cout
        bytes_ = 2 * (batch * hw * hw * cin + 16 * cin * cout
                      + batch * (hw // 2) ** 2 * cout * 2)  # bf16 io, f32 out
        roof = max(bytes_ / PEAK_BW, flops / PEAK_FLOPS)
        row = {"layer": tag, "hw": hw, "cin": cin, "cout": cout,
               "mult": mult, "roofline_us": round(roof * 1e6, 2)}
        ref = conv_xla(x, w)
        for name, fn in (("xla", conv_xla), ("tapmm", conv_tapmm),
                         ("pallas", conv_pallas)):
            try:
                out = jax.jit(fn)(x, w)
                err = float(jnp.max(jnp.abs(out - ref)) /
                            (jnp.max(jnp.abs(ref)) + 1e-9))
                t = timed(fn, x, w)
                row[f"{name}_us"] = round(t * 1e6, 2)
                row[f"{name}_err"] = round(err, 5)
                if name != "pallas":   # pallas bwd = future custom_vjp
                    tg = timed(grad_form(fn), x, w)
                    row[f"{name}_fwdbwd_us"] = round(tg * 1e6, 2)
            except Exception as e:
                row[f"{name}_error"] = repr(e)[:160]
        rows.append(row)
        print(json.dumps(row), flush=True)

    def total(key):
        return sum(r["mult"] * r.get(key, r.get("xla_us", 0)) for r in rows)

    print(json.dumps({
        "summary": "conv_down_ab",
        "weighted_fwd_us": {k: round(total(f"{k}_us"), 1)
                            for k in ("xla", "tapmm", "pallas")},
        "weighted_fwdbwd_us": {k: round(total(f"{k}_fwdbwd_us"), 1)
                               for k in ("xla", "tapmm")},
        "weighted_roofline_us": round(total("roofline_us"), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
