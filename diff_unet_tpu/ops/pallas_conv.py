"""Pallas TPU kernel: 3x3x3 'same' conv3d via tap-wise matmuls (experimental).

The 3D convolutions are the FLOP budget of every model in this framework
(SURVEY.md §2 consequence note). Each program DMAs one overlapping
(3, H_BLK+2, W_pad, C) halo slab into VMEM (overlap that BlockSpec block
indexing cannot express) and accumulates 27 tap matmuls on the MXU.

STATUS (measured v5e, 4x96^3x64->64 bf16): 26.7 TF/s vs XLA native conv
30.5 TF/s — XLA wins. Mosaic constraints force the gap: shifted concats and
unaligned spatial slices are unsupported, so tap shifts go through
pltpu.roll, which (a) only supports 32-bit data (forcing f32 casts) and
(b) serialises VPU work between the dots. Kept as a correct, tested
alternative path and a base for future Mosaic versions; the default conv
path everywhere is lax.conv_general_dilated.

Layout: NDHWC; 'same' zero padding; W padded to 8 (DMA sublane alignment),
C padded to 128 (DMA lane alignment).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv3d_same(x: jnp.ndarray, w: jnp.ndarray,
                h_blk: int = 8) -> jnp.ndarray:
    """x (B, D, H, W, Cin), w (3,3,3,Cin,Cout) -> (B, D, H, W, Cout)."""
    b, d, h, wd, cin_in = x.shape
    cout = w.shape[-1]
    assert h % h_blk == 0, (h, h_blk)
    # W is the DMA sublane dimension: pad (wd+2) up to a multiple of 8.
    # C is the lane dimension: pad to a multiple of 128 (Mosaic DMA slice
    # alignment; zero channels contribute nothing to the taps).
    w_pad = -(-(wd + 2) // 8) * 8
    cin = -(-cin_in // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, w_pad - wd - 1),
                     (0, cin - cin_in)))
    wk = jnp.pad(w, ((0, 0),) * 3 + ((0, cin - cin_in), (0, 0)))
    wk = wk.reshape(27 * cin, cout)

    grid = (b, d, h // h_blk)

    def kernel(x_hbm, w_ref, o_ref):
        ib = pl.program_id(0)
        id_ = pl.program_id(1)
        ih = pl.program_id(2)

        def body(slab, sem):
            dma = pltpu.make_async_copy(
                x_hbm.at[ib, pl.ds(id_, 3),
                         pl.ds(ih * h_blk, h_blk + 2), :, :],
                slab, sem,
            )  # slab: (3, h_blk+2, w_pad, cin)
            dma.start()
            dma.wait()
            # Mosaic supports neither shifted concats nor unaligned spatial
            # slices; realise the tap shifts with pltpu.roll (aligned) and
            # accumulate 27 (h_blk*W, Cin)x(Cin, Cout) dots.
            acc = jnp.zeros((h_blk * wd, cout), jnp.float32)
            wf = w_ref[:]
            for kd in range(3):
                # f32 working copy: Mosaic's rotate only supports 32-bit data
                plane = slab[kd].astype(jnp.float32)  # (h_blk+2, wd+2, cin)
                for kh in range(3):
                    # pltpu.roll needs non-negative shifts: -k == size - k
                    rowed = (
                        pltpu.roll(plane, h_blk + 2 - kh, 0) if kh else plane
                    )
                    for kw in range(3):
                        # roll size is the padded W; the [0:wd] view below
                        # never reaches the wrapped-in padding columns
                        shifted = (
                            pltpu.roll(rowed, w_pad - kw, 1) if kw
                            else rowed
                        )
                        # back to the input dtype: full-rate MXU dots
                        xc = shifted[0:h_blk, 0:wd, :].reshape(
                            h_blk * wd, cin
                        ).astype(w_ref.dtype)
                        tap = kd * 9 + kh * 3 + kw
                        acc = acc + jax.lax.dot_general(
                            xc, wf[tap * cin:(tap + 1) * cin, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
            o_ref[0, 0] = acc.reshape(h_blk, wd, cout).astype(o_ref.dtype)

        pl.run_scoped(
            body,
            slab=pltpu.VMEM((3, h_blk + 2, w_pad, cin), x.dtype),
            sem=pltpu.SemaphoreType.DMA,
        )

    x_spec = pl.BlockSpec(memory_space=pl.ANY)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec(
        (1, 1, h_blk, wd, cout),
        lambda ib, id_, ih: (ib, id_, ih, 0, 0),
        memory_space=pltpu.VMEM,
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, d, h, wd, cout), x.dtype),
        grid=grid,
        in_specs=[x_spec, w_spec],
        out_specs=o_spec,
    )(xp, wk)
