"""Overfit DiffUNet on synthetic geometric organs; report dice trajectory.

End-to-end functional validation of the training + inference pipeline
(BASELINE.json config-2 style): 4 synthetic 48^3 volumes with a sphere and
a box organ; full jitted train step (q_sample + denoise + mse,bce,dice) and
real DDIM-10 sliding-window evaluation.

Measured on TPU v5e: mean dice 0.13 -> 0.86 (100 it) -> 0.98 (200) -> 1.00
(300); 6.9 train iters/s. Run: python examples/overfit_synthetic.py
"""
import time, json
import numpy as np, jax, jax.numpy as jnp
from diff_unet_tpu.api import DiffusionSegmenter
from diff_unet_tpu.engine import make_optimizer, make_train_step
from diff_unet_tpu.engine.train import create_train_state
from diff_unet_tpu.engine.sliding_window import make_diffusion_inferer
from diff_unet_tpu.losses import CompositeLoss
from diff_unet_tpu.metrics import validation_dice
from diff_unet_tpu.models import DiffUNet

C = 2
S = 48
rng = np.random.RandomState(0)

def make_case(seed):
    r = np.random.RandomState(seed)
    img = r.randn(S, S, S).astype(np.float32) * 0.05
    lab = np.zeros((S, S, S), np.int32)
    # sphere organ 1
    c1 = r.randint(14, S-14, 3); rad = r.randint(6, 10)
    zz, yy, xx = np.mgrid[:S, :S, :S]
    d1 = (zz-c1[0])**2 + (yy-c1[1])**2 + (xx-c1[2])**2
    lab[d1 < rad**2] = 1
    # box organ 2
    c2 = r.randint(8, S-16, 3); w = r.randint(5, 9)
    lab[c2[0]:c2[0]+w, c2[1]:c2[1]+w, c2[2]:c2[2]+w] = 2
    img += (lab == 1) * 0.7 + (lab == 2) * 0.4   # intensity signal
    return img, lab

cases = [make_case(i) for i in range(4)]
images = np.stack([c[0] for c in cases])[..., None]
labels_int = np.stack([c[1] for c in cases])
onehot = np.stack([(labels_int == i).astype(np.float32) for i in (1, 2)], -1)

seg = DiffusionSegmenter(module=DiffUNet(out_channels=C, pack=2, dtype=jnp.bfloat16),
                         num_classes=C, sample_steps=10)
state = create_train_state(seg, jax.random.key(0), (4, S, S, S, 1),
                           make_optimizer(lr=3e-4, weight_decay=1e-5))
step = make_train_step(seg, CompositeLoss("mse,bce,dice", C))
batch = {"image": jnp.asarray(images), "label": jnp.asarray(onehot)}

infer = make_diffusion_inferer(seg, roi=(S, S, S), sw_batch_size=1, overlap=0.0)

def eval_dice():
    ds = []
    for i in range(4):
        _, binary = infer(state.params, jnp.asarray(images[i]), jax.random.key(9))
        d = validation_dice(binary, jnp.asarray(onehot[i]))
        ds.append(float(jnp.mean(d)))
    return float(np.mean(ds))

t0 = time.time()
traj = []
for it in range(401):
    state, m = step(state, batch, jax.random.key(1))
    if it % 100 == 0:
        loss = float(m["loss"])
        d = eval_dice()
        traj.append((it, round(loss, 4), round(d, 4)))
        print(json.dumps({"iter": it, "loss": round(loss,4), "mean_dice": round(d,4),
                          "elapsed_s": round(time.time()-t0,1)}), flush=True)
print("FINAL", traj[-1], flush=True)
