"""Where does the DiffSwinUNETR denoiser step spend its time? (v5e)

Chained timing inside one jit (the axon relay costs ~1.5-2 ms per
dispatch+host-read; `lax.fori_loop` chains with a carry-perturbed input
defeat CSE and amortise it away). Components are timed standalone with
fresh params — timing depends on shapes, not values.

Findings drive the Swin execution-layout work (VERDICT r2 weak #5 /
r3 ask #9): feature_size=48 channels pad to 128 lanes (2.67x) at the two
96^3-resolution conv blocks, the same lane-padding disease the DiffUNet
path cured with pack-2.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

from diff_unet_tpu.models.swin_unetr import (  # noqa: E402
    DiffSwinUNETR,
    UnetrBasicBlock,
    UnetrUpBlock,
)
from diff_unet_tpu.ops.swin import SwinTransformer  # noqa: E402

SW = 8
R = 96
C = 15
DT = jnp.bfloat16


def chain_time(fn, args, consts=(), n=8, reps=2):
    """Mean seconds per fn(*args, *consts) inside a fori chain (host-read
    barrier). `consts` (e.g. param trees) are REAL jit parameters: a
    closed-over Swin param tree baked into the HLO as constants exceeds the
    axon relay's compile-request size limit (HTTP 413)."""

    @jax.jit
    def run(c0, args, consts):
        def body(i, c):
            perturbed = jax.tree_util.tree_map(
                lambda a: a + c.astype(a.dtype) * 0
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                args,
            )
            out = fn(*perturbed, *consts)
            return c + jnp.mean(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, c0)

    _ = float(run(jnp.float32(0), args, consts))   # compile + warm
    best = float("inf")
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(run(jnp.float32(0), args, consts))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def timed(name, module, *args):
    params = module.init(jax.random.key(0), *args)
    dt = chain_time(lambda *a: module.apply(a[-1], *a[:-1]), args,
                    consts=(params,))
    print(f"{name:34s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    # component selection: a 30-min all-in-one run exceeds what the 1-vCPU
    # compile budget allows; run pieces in separate processes.
    #   --full   the DDIM loop body (whole denoiser)
    #   --swin   the SwinTransformer backbone
    #   --stages per-stage Swin timings (stage 1..4 standalone)
    #   --convs  the UNETR conv blocks
    which = set(a for a in sys.argv[1:] if a.startswith("--")) or {
        "--swin", "--convs"}
    temb = jnp.zeros((SW, 512), DT)
    x16 = jax.random.normal(jax.random.key(1), (SW, R, R, R, 16), DT)
    print(f"DiffSwinUNETR step breakdown  sw={SW} {R}^3 bf16  {which}",
          flush=True)

    if "--full" in which:
        # full model: the DDIM loop body (denoise w/ precomputed embeddings)
        model = DiffSwinUNETR(out_channels=C, image_size=(R, R, R), dtype=DT)
        image = jax.random.normal(jax.random.key(2), (SW, R, R, R, 1), DT)
        xt = jax.random.normal(jax.random.key(3), (SW, R, R, R, C), DT)
        t = jnp.zeros((SW,), jnp.int32)
        params = model.init(jax.random.key(0), image, xt, t)
        emb = jax.jit(
            lambda p, im: model.apply(p, im, method="embed"))(params, image)
        dt_full = chain_time(
            lambda im, x, p, e: model.apply(p, x, t, e, im,
                                            method="denoise_with_embeddings"),
            (image, xt), consts=(params, emb))
        print(f"{'denoise (loop body, full)':34s} {dt_full * 1e3:8.2f} ms",
              flush=True)

    if "--swin" in which:
        # swin ViT backbone on the concat input
        swin = SwinTransformer(embed_dim=48, depths=(2, 2, 2, 2),
                               num_heads=(3, 6, 12, 24),
                               time_conditioned=True, dtype=DT)
        sp = swin.init(jax.random.key(0), x16, temb)
        dt_swin = chain_time(
            lambda x, tb, p: swin.apply(p, x, tb)[4], (x16, temb),
            consts=(sp,))
        print(f"{'swinViT (5 stages)':34s} {dt_swin * 1e3:8.2f} ms",
              flush=True)

    if "--stages" in which:
        # one stage at a time: BasicLayer(dim, depth=2) at its live geometry
        from diff_unet_tpu.ops.swin import BasicLayer
        for i, (dim, heads, res) in enumerate(
                [(48, 3, 48), (96, 6, 24), (192, 12, 12), (384, 24, 6)]):
            xs = jax.random.normal(jax.random.key(6 + i),
                                   (SW, res, res, res, dim), DT)
            layer = BasicLayer(dim=dim, depth=2, num_heads=heads,
                               window_size=(7, 7, 7), downsample=True,
                               dtype=DT)
            timed(f"stage{i + 1} ({res}^3, C={dim}, h={heads})", layer, xs)

    if "--convs" in which:
        # the two full-resolution (96^3) conv blocks
        h48 = jax.random.normal(jax.random.key(4),
                                (SW, R // 2, R // 2, R // 2, 48), DT)
        x48 = jax.random.normal(jax.random.key(5), (SW, R, R, R, 48), DT)
        timed("encoder1 (96^3, 16->48->48)", UnetrBasicBlock(48, dtype=DT),
              x16, temb)
        timed("decoder1 (48^3->96^3 up + res)", UnetrUpBlock(48, dtype=DT),
              h48, x48, temb)
        # one half-resolution pair for contrast
        timed("encoder2 (48^3, 48->48)", UnetrBasicBlock(48, dtype=DT),
              h48, temb)


if __name__ == "__main__":
    main()
