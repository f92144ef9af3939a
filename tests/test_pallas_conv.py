"""Pallas conv3d: interpret-mode parity vs lax conv."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_unet_tpu.ops.pallas_conv import conv3d_same


def test_conv3d_same_matches_lax():
    from jax.experimental.pallas import tpu as pltpu
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 12, 4), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (3, 3, 3, 4, 6)) * 0.1
    with pltpu.force_tpu_interpret_mode():
        got = conv3d_same(x, w, h_blk=4)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_conv3d_same_odd_width_and_channels():
    from jax.experimental.pallas import tpu as pltpu
    x = jax.random.normal(jax.random.key(2), (1, 4, 4, 10, 3), jnp.float32)
    w = jax.random.normal(jax.random.key(3), (3, 3, 3, 3, 5)) * 0.1
    with pltpu.force_tpu_interpret_mode():
        got = conv3d_same(x, w, h_blk=2)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
