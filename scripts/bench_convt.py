"""Is XLA's lhs-dilated transposed conv slow on TPU vs phase decomposition?

Times the fused 8-tap mixed up-conv (the generator's FLOP hog) in both forms
at the unet_256 generator's actual layer shapes, fwd and fwd+bwd.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from semantic_segmentation_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from semantic_segmentation_tpu.ops.conv import conv_transpose_nd  # noqa: E402

S = 30
REPS = 4


def conv_transpose_phased(x, w, stride=2, torch_padding=3):
    """Per-output-phase dense convs + interleave (derivation in ops/conv.py)."""
    s, k, q = stride, w.shape[0], w.shape[0] - 1 - torch_padding
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    phases = []
    for r in range(s):
        row = []
        for c in range(s):
            jr = (q - r) % s
            jc = (q - c) % s
            wr = w[jr::s, jc::s]          # (Tr, Tc, Cin, Cout)
            offr, offc = (q - r) // s, (q - c) // s
            Tr, Tc = wr.shape[0], wr.shape[1]
            # out length per phase = H (O = s*H, equal phases for these shapes)
            padr = (offr, Tr - 1 - offr)
            padc = (offc, Tc - 1 - offc)
            y = jax.lax.conv_general_dilated(
                x, wr, window_strides=(1, 1),
                padding=[padr, padc],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            row.append(y)
        phases.append(row)
    Y = jnp.stack([jnp.stack(row, axis=3) for row in phases], axis=2)
    # (B, H, s, W, s, C) -> (B, sH, sW, C)
    return Y.reshape(B, s * H, s * W, Cout)


def conv_transpose_phase_packed(x, w, stride=2, torch_padding=3):
    """All s^2 phases in ONE dense conv with s^2*Cout output channels (4x
    the output-lane utilization of per-phase convs — decisive when Cout is
    tiny, e.g. the generator's 1-channel output layer), then per-phase
    shifted slices + interleave."""
    s, k, q = stride, w.shape[0], w.shape[0] - 1 - torch_padding
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    ws, offs = [], []
    for r in range(s):
        for c in range(s):
            jr, jc = (q - r) % s, (q - c) % s
            ws.append(w[jr::s, jc::s])            # (T, T, Cin, Cout)
            offs.append(((q - r) // s, (q - c) // s))
    Wp = jnp.concatenate(ws, axis=-1)             # (T, T, Cin, s*s*Cout)
    T = Wp.shape[0]
    plo_r = max(o[0] for o in offs)
    phi_r = T - 1 - min(o[0] for o in offs)
    plo_c = max(o[1] for o in offs)
    phi_c = T - 1 - min(o[1] for o in offs)
    y = jax.lax.conv_general_dilated(
        x, Wp, window_strides=(1, 1),
        padding=[(plo_r, phi_r), (plo_c, phi_c)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rows = []
    for r in range(s):
        row = []
        for c in range(s):
            i = r * s + c
            offr, offc = offs[i]
            sl = y[:, plo_r - offr:plo_r - offr + H,
                   plo_c - offc:plo_c - offc + W,
                   i * Cout:(i + 1) * Cout]
            row.append(sl)
        rows.append(row)
    Y = jnp.stack([jnp.stack(row, axis=3) for row in rows], axis=2)
    return Y.reshape(B, s * H, s * W, Cout)


def timeit(fn, *args):
    @jax.jit
    def reps(*a):
        def body(carry, i):
            r = fn(*[x if j else x + 0e0 * i for j, x in enumerate(a)])
            return carry + jnp.sum(r[..., :1]), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(S))
        return c

    jax.device_get(reps(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = reps(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / (REPS * S) * 1e3


def main():
    rng = np.random.default_rng(0)
    out = {"device": jax.devices()[0].device_kind}
    # unet_256 generator's up-conv layer shapes (B=2): (H_in, Cin, Cout).
    # h128_c128x1 is the OUTERMOST upconv (concat 64+64 -> output_nc=1):
    # the device trace shows it at 6-9 GB/s (1-lane output), 3.85 ms/iter
    # across the three per-iteration netG forwards — the single worst op.
    layers = [(128, 128, 1), (64, 256, 64), (32, 512, 128),
              (16, 1024, 256), (8, 1024, 512)]
    for H, Cin, Cout in layers:
        x = jnp.asarray(rng.standard_normal((2, H, H, Cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((8, 8, Cin, Cout)) * 0.02,
                        jnp.bfloat16)

        def dil(x, w):
            return conv_transpose_nd(x, w, stride=2, torch_padding=3)

        def pha(x, w):
            return conv_transpose_phased(x, w)

        def pck(x, w):
            return conv_transpose_phase_packed(x, w)

        # check equivalence
        a = jax.device_get(dil(x, w)).astype(np.float32)
        b = jax.device_get(pha(x, w)).astype(np.float32)
        c = jax.device_get(pck(x, w)).astype(np.float32)
        err = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))
        errp = float(np.max(np.abs(a - c)) / (np.max(np.abs(a)) + 1e-9))
        key = f"h{H}_c{Cin}x{Cout}"
        out[key + "_relerr"] = round(err, 6)
        out[key + "_relerr_packed"] = round(errp, 6)
        out[key + "_dilated_ms"] = round(timeit(dil, x, w), 3)
        out[key + "_phased_ms"] = round(timeit(pha, x, w), 3)
        out[key + "_packed_ms"] = round(timeit(pck, x, w), 3)

        def dil_bwd(x, w):
            return jax.grad(lambda w: jnp.sum(dil(x, w) ** 2))(w)

        def pha_bwd(x, w):
            return jax.grad(lambda w: jnp.sum(pha(x, w) ** 2))(w)

        def pck_bwd(x, w):
            return jax.grad(lambda w: jnp.sum(pck(x, w) ** 2))(w)

        out[key + "_dilated_bwd_ms"] = round(timeit(dil_bwd, x, w), 3)
        out[key + "_phased_bwd_ms"] = round(timeit(pha_bwd, x, w), 3)
        out[key + "_packed_bwd_ms"] = round(timeit(pck_bwd, x, w), 3)
        print(json.dumps(out), file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
