"""Diffusion noise schedules and timestep respacing.

Capability parity with the reference's `guided_diffusion/gaussian_diffusion.py`
(get_named_beta_schedule, gaussian_diffusion.py:18-62; precomputed
alpha-cumprod tables, gaussian_diffusion.py:118-168) and
`guided_diffusion/respace.py` (space_timesteps, SpacedDiffusion,
respace.py:7-113) — redesigned as a frozen table-of-constants dataclass.

All tables are computed in float64 numpy at construction time (matching the
reference's precision choice, gaussian_diffusion.py:132-133) and materialised
as float32 constants when gathered inside a jitted computation. Gathering a
(T,)-table by a traced `t` and broadcasting — the analogue of the reference's
`_extract_into_tensor` (gaussian_diffusion.py:904-917) — compiles to a single
dynamic-gather + broadcast on TPU; with T<=1000 the tables live comfortably
in SMEM/VMEM as compile-time constants.

Respacing (the reference's SpacedDiffusion) is represented *in-band*: a
respaced `Schedule` carries its own recomputed beta tables plus a
`timestep_map` (int32, length T_respaced) mapping respaced indices to raw
model timesteps — the analogue of `_WrappedModel` (respace.py:116-129), but
applied functionally at the call site instead of wrapping the model object.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence, Union

import numpy as np
import jax.numpy as jnp


def linear_beta_schedule(num_timesteps: int) -> np.ndarray:
    """Linear beta schedule from Ho et al., scaled to any step count."""
    scale = 1000.0 / num_timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    return np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)


def betas_for_alpha_bar(
    num_timesteps: int,
    alpha_bar: Callable[[float], float],
    max_beta: float = 0.999,
) -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas."""
    t = np.arange(num_timesteps, dtype=np.float64)
    a1 = np.array([alpha_bar(x) for x in t / num_timesteps])
    a2 = np.array([alpha_bar(x) for x in (t + 1) / num_timesteps])
    return np.minimum(1.0 - a2 / a1, max_beta)


def cosine_beta_schedule(num_timesteps: int) -> np.ndarray:
    return betas_for_alpha_bar(
        num_timesteps,
        lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
    )


def get_named_beta_schedule(name: str, num_timesteps: int) -> np.ndarray:
    if name == "linear":
        return linear_beta_schedule(num_timesteps)
    if name == "cosine":
        return cosine_beta_schedule(num_timesteps)
    raise NotImplementedError(f"unknown beta schedule: {name}")


def space_timesteps(
    num_timesteps: int, section_counts: Union[str, Sequence[int]]
) -> list[int]:
    """Select a strided subset of timesteps (sorted ascending).

    Mirrors the behaviour of the reference respace.py:7-60, including the
    per-section fractional striding and the "ddimN" string form.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return list(range(0, num_timesteps, stride))
            raise ValueError(
                f"cannot create exactly {desired} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]

    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: list[int] = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        frac_stride = 1.0 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return sorted(set(all_steps))


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Precomputed diffusion tables (all float64 numpy, shape (T,)).

    A `Schedule` is pure static data: it contains no traced values, so it can
    be closed over by jitted functions, where each table becomes a small
    on-chip constant.
    """

    betas: np.ndarray
    timestep_map: np.ndarray  # int32 (T,), respaced idx -> raw model timestep

    # derived tables
    alphas_cumprod: np.ndarray = dataclasses.field(init=False)
    alphas_cumprod_prev: np.ndarray = dataclasses.field(init=False)
    alphas_cumprod_next: np.ndarray = dataclasses.field(init=False)
    sqrt_alphas_cumprod: np.ndarray = dataclasses.field(init=False)
    sqrt_one_minus_alphas_cumprod: np.ndarray = dataclasses.field(init=False)
    log_one_minus_alphas_cumprod: np.ndarray = dataclasses.field(init=False)
    sqrt_recip_alphas_cumprod: np.ndarray = dataclasses.field(init=False)
    sqrt_recipm1_alphas_cumprod: np.ndarray = dataclasses.field(init=False)
    posterior_variance: np.ndarray = dataclasses.field(init=False)
    posterior_log_variance_clipped: np.ndarray = dataclasses.field(init=False)
    posterior_mean_coef1: np.ndarray = dataclasses.field(init=False)
    posterior_mean_coef2: np.ndarray = dataclasses.field(init=False)
    # FIXED_LARGE variance tables (posterior_variance[1] prepended to betas[1:],
    # the decoder-likelihood trick of gaussian_diffusion.py:280-283)
    fixed_large_variance: np.ndarray = dataclasses.field(init=False)
    fixed_large_log_variance: np.ndarray = dataclasses.field(init=False)

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        object.__setattr__(self, "betas", betas)
        tmap = np.asarray(self.timestep_map, dtype=np.int32)
        assert tmap.shape == betas.shape
        object.__setattr__(self, "timestep_map", tmap)

        alphas = 1.0 - betas
        ac = np.cumprod(alphas, axis=0)
        ac_prev = np.append(1.0, ac[:-1])
        ac_next = np.append(ac[1:], 0.0)

        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        # posterior variance is 0 at t=0; clip the log as the reference does
        post_log_var = np.log(np.append(post_var[1], post_var[1:]))

        fl_var = np.append(post_var[1], betas[1:])

        # betas may reach 1.0 for very short linear schedules (scale*0.02);
        # the reciprocal tables are then inf at the last step, matching the
        # reference's float64 numpy behaviour — silence the warning only.
        with np.errstate(divide="ignore"):
            fields = dict(
                alphas_cumprod=ac,
                alphas_cumprod_prev=ac_prev,
                alphas_cumprod_next=ac_next,
                sqrt_alphas_cumprod=np.sqrt(ac),
                sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - ac),
                log_one_minus_alphas_cumprod=np.log(1.0 - ac),
                sqrt_recip_alphas_cumprod=np.sqrt(1.0 / ac),
                sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / ac - 1.0),
                posterior_variance=post_var,
                posterior_log_variance_clipped=post_log_var,
                posterior_mean_coef1=betas * np.sqrt(ac_prev) / (1.0 - ac),
                posterior_mean_coef2=(1.0 - ac_prev) * np.sqrt(alphas)
                / (1.0 - ac),
                fixed_large_variance=fl_var,
                fixed_large_log_variance=np.log(fl_var),
            )
        for k, v in fields.items():
            object.__setattr__(self, k, v)

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @classmethod
    def from_betas(cls, betas: np.ndarray) -> "Schedule":
        betas = np.asarray(betas, dtype=np.float64)
        return cls(betas=betas, timestep_map=np.arange(len(betas), dtype=np.int32))

    @classmethod
    def create(
        cls,
        schedule_name: str = "linear",
        num_timesteps: int = 1000,
        respace: Optional[Union[str, Sequence[int]]] = None,
    ) -> "Schedule":
        """Build a (possibly respaced) schedule.

        `respace=[10]` reproduces the reference's inference process
        `SpacedDiffusion(space_timesteps(1000, [10]), ...)`
        (models/diffusion/diffusion.py:40-45): betas are recomputed from the
        retained alpha-cumprod values so the respaced process has identical
        marginals at the retained steps.
        """
        betas = get_named_beta_schedule(schedule_name, num_timesteps)
        if respace is None:
            return cls.from_betas(betas)
        keep = space_timesteps(num_timesteps, respace)
        base_ac = np.cumprod(1.0 - betas)
        new_betas = []
        last = 1.0
        for i in keep:
            new_betas.append(1.0 - base_ac[i] / last)
            last = base_ac[i]
        return cls(
            betas=np.asarray(new_betas, dtype=np.float64),
            timestep_map=np.asarray(keep, dtype=np.int32),
        )

    def map_timesteps(self, t: jnp.ndarray) -> jnp.ndarray:
        """Map respaced indices to raw model timesteps (respace.py:123-126)."""
        return jnp.asarray(self.timestep_map)[t]


def extract(table: np.ndarray, t: jnp.ndarray, ndim: int,
            dtype=jnp.float32) -> jnp.ndarray:
    """Gather per-timestep scalars and broadcast to an `ndim`-rank tensor.

    TPU-native analogue of `_extract_into_tensor`
    (gaussian_diffusion.py:904-917): the float64 numpy table becomes an
    on-chip float32 constant; the gather + reshape fuses into the consumer.
    """
    vals = jnp.asarray(table, dtype=dtype)[t]
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))
