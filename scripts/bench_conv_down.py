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
    # bf16 in -> bf16 out (the production flax path: nn.Conv dtype=bf16);
    # XLA accumulates the MXU products in f32 internally either way
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


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
    return acc.astype(x.dtype)


def conv_pallas(x, w, row_block=None):
    """Implicit-GEMM Pallas kernel. The input is pre-split outside into the
    4 stride-2 phases (q = 2r+c: x[2i+r, 2j+c]), zero-padded by one phase
    row/col per side. Grid over (batch, output-row blocks); each step DMAs
    the 4 phase row-slabs (incl. halo) from HBM to a VMEM scratch,
    assembles the (row_block*Wo, 16*Cin) patch matrix from shifted phase
    slices, and runs ONE MXU matmul against the (16*Cin, Cout) reshaped
    kernel (resident in VMEM across the grid). All refs are rank <= 5
    (Mosaic rejected the rank-6 single-buffer form)."""
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

    # 4-phase split with a 1-phase-row/col zero halo on each side:
    # xq[2r+c, b, i+1, j+1] = x[b, 2i+r, 2j+c]
    xp = x.reshape(B, Ho, 2, Wo, 2, C)
    xq = jnp.stack([xp[:, :, r, :, c, :] for r in range(2)
                    for c in range(2)])               # (4, B, Ho, Wo, C)
    xq = jnp.pad(xq, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))

    def kernel(xr, wr, out):
        b = pl.program_id(0)
        i = pl.program_id(1)

        def body(scratch, sems):
            copies = [
                pltpu.make_async_copy(
                    xr.at[q, b, pl.ds(i * row_block, row_block + 2)],
                    scratch.at[q], sems.at[q])
                for q in range(4)
            ]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()
            taps = []
            for dy in range(4):
                r, orr = (dy - 1) % 2, (dy - 1) // 2
                for dx in range(4):
                    c, occ = (dx - 1) % 2, (dx - 1) // 2
                    taps.append(scratch[2 * r + c,
                                        1 + orr:1 + orr + row_block,
                                        1 + occ:1 + occ + Wo, :])
            patch = jnp.concatenate(
                [t.reshape(row_block * Wo, C) for t in taps], axis=1)
            out[0] = jnp.dot(
                patch, wr[:], preferred_element_type=jnp.float32,
            ).reshape(row_block, Wo, Cout).astype(out.dtype)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((4, row_block + 2, Wo + 2, C), x.dtype),
            sems=pltpu.SemaphoreType.DMA((4,)),
        )

    grid = (B, Ho // row_block)
    return pl.pallas_call(
        kernel,
        grid=grid,
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16 * C, Cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_block, Wo, Cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), x.dtype),
    )(xq, wm)


S_SHORT, S_LONG = 400, 1600


def timed(fn, x, w):
    """Per-iteration time by TWO-POINT SLOPE: (t(S_LONG) - t(S_SHORT)) /
    (S_LONG - S_SHORT), each with the iterations scanned ON DEVICE in one
    dispatch and synced by device_get (this tunnel's block_until_ready is a
    no-op and each dispatch carries a fixed ~25 ms round-trip — the first
    harness measured exactly that constant for every layer). The slope
    cancels the fixed per-dispatch cost. A one-element feedback into x
    defeats loop-invariant hoisting without adding measurable work."""
    def make(length):
        @jax.jit
        def many(x, w):
            def body(c, _):
                y = fn(x + c, w)
                return y.reshape(-1)[0].astype(x.dtype) * 1e-12, None
            c, _ = lax.scan(body, jnp.zeros((), x.dtype), None,
                            length=length)
            return c
        return many

    m1, m2 = make(S_SHORT), make(S_LONG)
    jax.device_get(m1(x, w))
    jax.device_get(m2(x, w))
    slopes = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_get(m1(x, w))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(m2(x, w))
        t2 = time.perf_counter() - t0
        slopes.append((t2 - t1) / (S_LONG - S_SHORT))
    return sorted(slopes)[len(slopes) // 2]


def grad_form(conv):
    def gf(x, w):
        def loss(x, w):
            # cast the f32-accumulated output back to the compute dtype so
            # the conv transpose rules see a bf16 cotangent (production
            # layers do the same: bf16 activations downstream)
            return jnp.sum(conv(x, w).astype(x.dtype) ** 2)
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
                      + batch * (hw // 2) ** 2 * cout)    # all bf16 io
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
