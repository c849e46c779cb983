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


def conv_tapmm_concat(x, w):
    """Small-C specialization: build the (B, Ho, Wo, 16*C) patch tensor
    once (16 shifted phase views concatenated on the channel axis) and run
    ONE matmul against the (16*C, Cout) reshaped kernel. For C_in in
    {1, 2} the per-tap einsums of conv_tapmm degenerate to K=1 matmuls
    (measured 2.3x SLOWER than XLA); concatenating first gives K=16*C and
    only 16x a tiny input's bytes of patch traffic."""
    B, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    Cout = w.shape[-1]
    xp = x.reshape(B, Ho, 2, Wo, 2, C)
    phases = []
    for dy in range(4):
        r, orr = (dy - 1) % 2, (dy - 1) // 2
        for dx in range(4):
            c, occ = (dx - 1) % 2, (dx - 1) // 2
            ph = xp[:, :, r, :, c, :]
            if orr or occ:
                ph = _shift2d(ph, orr, occ)
            phases.append(ph)
    patch = jnp.concatenate(phases, axis=-1)          # (B, Ho, Wo, 16C)
    y = jnp.einsum("bhwk,kf->bhwf", patch, w.reshape(16 * C, Cout),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def conv_pallas(x, w, row_block=None):
    """Implicit-GEMM Pallas kernel. The input is pre-split outside into the
    4 stride-2 phases (q = 2r+c: x[2i+r, 2j+c]) with a zero halo, columns
    padded to a multiple of 8. Grid over (batch, output-row blocks); each
    step issues 8 async DMAs — one per (phase, row-offset) pair, copying a
    full-width (row_block, Wpad, C) HBM window into a whole VMEM slab (row
    offsets live on an untiled dim; Mosaic requires 8-aligned offsets on
    tiled dims, which rules out column-window DMAs and VMEM ref slices) —
    loads each slab as a VALUE and takes the +-1 column shifts as vector
    slices, assembles the (row_block*Wo, 16*C) patch matrix, and runs ONE
    MXU matmul against the (16*C, Cout) reshaped kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    Cout = w.shape[-1]
    # Mosaic's lane tiling (128) rejects ref slices whose channel extent
    # is not a multiple of 128 even at full extent: zero-pad channels (and
    # the matching kernel rows — same math) up to the lane tile. C < 8
    # would inflate input bytes >16x; those layers keep the XLA lowering.
    if C < 8:
        raise NotImplementedError(f"conv_pallas requires C_in >= 8, got {C}")
    if C % 128:
        Cp = 128 if C < 128 else ((C + 127) // 128) * 128
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
        C = Cp
    if row_block is None:
        # target <=2 MB patch matrix in VMEM
        row_block = max(1, min(Ho, 2**21 // max(1, Wo * 16 * C * 2)))
        while Ho % row_block:
            row_block -= 1
    wm = w.reshape(16 * C, Cout)

    # 4-phase split with a 1-phase-row/col zero halo, cols padded to %8:
    # xq[2r+c, b, i+1, j+1] = x[b, 2i+r, 2j+c]
    Wpad = ((Wo + 2 + 7) // 8) * 8
    xp = x.reshape(B, Ho, 2, Wo, 2, C)
    xq = jnp.stack([xp[:, :, r, :, c, :] for r in range(2)
                    for c in range(2)])               # (4, B, Ho, Wo, C)
    xq = jnp.pad(xq, ((0, 0), (0, 0), (1, 1), (1, Wpad - Wo - 1), (0, 0)))

    TAPS, PAIRS = [], []
    for dy in range(4):
        r, orr = (dy - 1) % 2, (dy - 1) // 2
        for dx in range(4):
            c, occ = (dx - 1) % 2, (dx - 1) // 2
            if (2 * r + c, orr) not in PAIRS:
                PAIRS.append((2 * r + c, orr))
            TAPS.append((PAIRS.index((2 * r + c, orr)), occ))

    def kernel(xr, wr, out, *slabs_and_sems):
        slabs, sems = slabs_and_sems[:8], slabs_and_sems[8]
        b = pl.program_id(0)
        i = pl.program_id(1)
        copies = [
            pltpu.make_async_copy(
                xr.at[q, b, pl.ds(i * row_block + 1 + orr, row_block)],
                slabs[s], sems.at[s])
            for s, (q, orr) in enumerate(PAIRS)
        ]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()
        full = [s[:] for s in slabs]                  # VALUE loads
        patch = jnp.concatenate(
            [full[s][:, 1 + occ:1 + occ + Wo, :].reshape(row_block * Wo, C)
             for s, occ in TAPS], axis=1)
        out[0] = jnp.dot(
            patch, wr[:], preferred_element_type=jnp.float32,
        ).reshape(row_block, Wo, Cout).astype(out.dtype)

    grid = (B, Ho // row_block)
    slab = pltpu.VMEM((row_block, Wpad, C), x.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((16 * C, Cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_block, Wo, Cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), x.dtype),
        scratch_shapes=[slab] * 8 + [pltpu.SemaphoreType.DMA((8,))],
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
                flat = y.reshape(-1)
                # consume ONE element at a DATA-DEPENDENT index: a static
                # [0] lets XLA narrow the whole conv to one output element
                # (measured: 0.04 us/iter "convs", far below roofline); an
                # index XLA cannot fold forces the full output to
                # materialize while costing one dynamic-slice
                idx = jnp.abs(flat[:1]).astype(jnp.int32)[0] % flat.shape[0]
                return (lax.dynamic_index_in_dim(flat, idx, keepdims=False)
                        .astype(x.dtype) * 1e-12), None
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
        # fold the FULL dw into the output (sum reads every element, so the
        # whole wgrad must be computed; dw is small so the sum is free) —
        # dx is consumed by timed()'s dynamic-index trick
        return dx + jnp.sum(dw).astype(dx.dtype) * 1e-12
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
                         ("tapcat", conv_tapmm_concat),
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
                            for k in ("xla", "tapmm", "tapcat", "pallas")},
        "weighted_fwdbwd_us": {k: round(total(f"{k}_fwdbwd_us"), 1)
                               for k in ("xla", "tapmm", "tapcat")},
        "weighted_roofline_us": round(total("roofline_us"), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
