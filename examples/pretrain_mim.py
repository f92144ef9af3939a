"""HybridMIM encoder pretraining -> DiffUNet graft (VERDICT r3 ask #6).

The in-framework equivalent of producing the reference's
`pretrained/basic_unet/encoder.pt` (loaded at reference train.py:166-176):
pretrain a HybridMIMBasicUNet with the composite MIM objective
(reconstruction + 9-way mask counts + 8-way position flags + contrastive
view pair, models/hybrid_mim.py:hybrid_mim_loss), then save the ENCODER
SUBTREE as an orbax checkpoint that
`Trainer(pretrained_path=<out_dir>)` grafts into DiffUNet's embed_model.

Runs on synthetic volumes by default so it is demonstrable anywhere:

    python examples/pretrain_mim.py --steps 50 --out logs/mim_encoder

With a real datalist, swap `synthetic_batch` for the CacheDataset loader.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from diff_unet_tpu.engine import checkpoint as ckpt_lib
from diff_unet_tpu.models.hybrid_mim import (
    HybridMIMBasicUNet,
    make_mim_pretrain_step,
)

ENCODER_KEYS = ("conv_0", "down_1", "down_2", "down_3", "down_4")


def synthetic_batch(rng, batch, size):
    """Random soft blobs: enough structure for the MIM heads to learn."""
    keys = jax.random.split(rng, 2)
    base = jax.random.normal(keys[0], (batch, size, size, size, 1))
    # low-frequency content via average pooling of noise
    smooth = jax.lax.reduce_window(
        base, 0.0, jax.lax.add, (1, 9, 9, 9, 1), (1, 1, 1, 1, 1), "SAME"
    ) / 9.0 ** 3
    return smooth + 0.1 * jax.random.normal(keys[1], base.shape)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="logs/mim_encoder")
    ap.add_argument("--features", type=int, nargs=6,
                    default=(64, 64, 128, 256, 512, 64),
                    help="must match the DiffUNet features to graft into")
    args = ap.parse_args()

    model = HybridMIMBasicUNet(features=tuple(args.features))
    rng = jax.random.key(0)
    x0 = synthetic_batch(rng, args.batch, args.size)
    params = model.init(jax.random.key(1), x0, rng=jax.random.key(2))
    state = train_state.TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adamw(args.lr),
    )
    step = make_mim_pretrain_step(model)

    t0 = time.time()
    for i in range(args.steps):
        batch = synthetic_batch(jax.random.fold_in(rng, i), args.batch,
                                args.size)
        state, metrics = step(state, batch, jax.random.key(3))
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i}: loss={float(metrics['loss']):.4f} "
                  f"recon={float(metrics['recon']):.4f} "
                  f"count_ce={float(metrics['count_ce']):.4f} "
                  f"pos_bce={float(metrics['pos_bce']):.4f} "
                  f"contrast={float(metrics['contrast']):.4f}")
    print(f"{args.steps} steps in {time.time() - t0:.1f}s")

    encoder = {k: state.params["params"][k] for k in ENCODER_KEYS}
    ckpt_lib.save_checkpoint(args.out, encoder)
    print(f"encoder subtree saved to {args.out}; finetune with "
          f"Trainer(pretrained_path={args.out!r})")


if __name__ == "__main__":
    main()
