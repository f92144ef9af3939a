"""Pack-2 execution of the DiffSwinUNETR full-resolution blocks.

The packed Swin path (models/swin_unetr.py PackedUnetResBlock /
PackedUnetrUpBlockEnter, ops/packed.py packed_patch_embed2) is a pure
layout transform of the same parameters: in float64 (where instance-norm
statistics are exact) packed and unpacked execution agree to ~1e-13.
Reference topology: models/swin_unetr/denoiser.py:36-457.

Float32 production runs differ only by instance-norm statistic rounding
(one-pass E[x^2]-E[x]^2, different reduction order), same class of noise
the BasicUNet packed tests tolerate.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_unet_tpu.ops import packed as pk

F = 2


def test_packed_patch_embed_matches():
    """Stride-2 patch embed consumes one packed column per output position:
    packed input -> UNPACKED half-resolution output equals nn.Conv."""
    from flax import linen as nn
    cin, cout = 3, 8
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 8, cin))
    w = jax.random.normal(jax.random.key(1), (2, 2, 2, cin, cout)) * 0.2
    b = jax.random.normal(jax.random.key(2), (cout,)) * 0.1
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    got = pk.packed_patch_embed2(pk.pack_w(x, F), w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_patch_embed_concat_groups():
    """Patch embed over concat([pack(img), pack(x)]) with concat_groups
    equals the unpacked conv over concat([img, x])."""
    ca, cb, cout = 1, 2, 8
    a = jax.random.normal(jax.random.key(0), (1, 8, 8, 8, ca))
    bt = jax.random.normal(jax.random.key(1), (1, 8, 8, 8, cb))
    w = jax.random.normal(jax.random.key(2), (2, 2, 2, ca + cb, cout)) * 0.2
    cat = jnp.concatenate([a, bt], -1)
    want = jax.lax.conv_general_dilated(
        cat, w, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    cat_p = jnp.concatenate([pk.pack_w(a, F), pk.pack_w(bt, F)], -1)
    got = pk.packed_patch_embed2(cat_p, w, None,
                                 pk.concat_groups([ca, cb], F))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _swin_models(**extra):
    from diff_unet_tpu.models.swin_unetr import DiffSwinUNETR
    kw = dict(out_channels=2, in_channels=1, image_size=(32, 32, 32),
              feature_size=12, dtype=None)
    kw.update(extra)
    return DiffSwinUNETR(pack=1, **kw), DiffSwinUNETR(pack=F, **kw)


def test_packed_diff_swin_unetr_exact_x64():
    """Same params -> same denoise logits, packed vs unpacked execution.

    Run in float64 so instance-norm statistics are exact and the layout
    transform is verified as a mathematical identity (~1e-13), not merely
    'close under f32 stat noise'."""
    with jax.enable_x64(True):
        plain, packd = _swin_models()
        img = jax.random.normal(jax.random.key(1), (1, 32, 32, 32, 1),
                                jnp.float64)
        x = jax.random.normal(jax.random.key(2), (1, 32, 32, 32, 2),
                              jnp.float64)
        t = jnp.array([7], jnp.int32)
        params = plain.init(jax.random.key(0), img, x, t)["params"]
        pp = packd.init(jax.random.key(0), img, x, t)["params"]
        # identical trees: the packed module inits to the same structure
        fu = jax.tree_util.tree_leaves_with_path(params)
        fp = jax.tree_util.tree_leaves_with_path(pp)
        assert [str(k) for k, _ in fu] == [str(k) for k, _ in fp]
        params = jax.tree.map(
            lambda a_: a_.astype(jnp.float64)
            if a_.dtype == jnp.float32 else a_, params)
        want = plain.apply({"params": params}, img, x, t)
        got = packd.apply({"params": params}, img, x, t)
        assert float(jnp.abs(want - got).max()) < 1e-10


def test_packed_swin_embeddings_loop_layout():
    """denoise_with_embeddings (unpacked contract, packs internally) agrees
    with denoise on the packed model — the DDIM loop entry points are
    layout-consistent."""
    with jax.enable_x64(True):
        _, packd = _swin_models()
        img = jax.random.normal(jax.random.key(1), (1, 32, 32, 32, 1),
                                jnp.float64)
        x = jax.random.normal(jax.random.key(2), (1, 32, 32, 32, 2),
                              jnp.float64)
        t = jnp.array([3], jnp.int32)
        params = packd.init(jax.random.key(0), img, x, t)["params"]
        params = jax.tree.map(
            lambda a_: a_.astype(jnp.float64)
            if a_.dtype == jnp.float32 else a_, params)
        want = packd.apply({"params": params}, img, x, t,
                           method="denoise")
        emb = packd.apply({"params": params}, img, method="embed")
        got = packd.apply({"params": params}, x, t, emb, img,
                          method="denoise_with_embeddings")
        assert float(jnp.abs(want - got).max()) < 1e-10
        # fully-packed loop: packed embeddings + packed state
        emb_p = packd.apply({"params": params}, pk.pack_w(img, F),
                            method="embed_packed")
        got_p = packd.apply({"params": params}, pk.pack_w(x, F), t, emb_p,
                            pk.pack_w(img, F), method="denoise_packed")
        assert float(jnp.abs(want - pk.unpack_w(got_p, F)).max()) < 1e-10


def test_packed_swin_gradients_match_x64():
    """Packed execution is also a layout identity under autodiff: parameter
    gradients of the denoise output agree with the unpacked model (~1e-10 in
    f64), so pack=2 is valid for TRAINING the Swin family, not just DDIM
    inference."""
    with jax.enable_x64(True):
        plain, packd = _swin_models()
        img = jax.random.normal(jax.random.key(1), (1, 32, 32, 32, 1),
                                jnp.float64)
        x = jax.random.normal(jax.random.key(2), (1, 32, 32, 32, 2),
                              jnp.float64)
        t = jnp.array([5], jnp.int32)
        params = plain.init(jax.random.key(0), img, x, t)["params"]
        params = jax.tree.map(
            lambda a_: a_.astype(jnp.float64)
            if a_.dtype == jnp.float32 else a_, params)
        # a fixed cotangent-like weighting keeps the scalar non-degenerate
        wgt = jax.random.normal(jax.random.key(3), (1, 32, 32, 32, 2),
                                jnp.float64)

        def loss(m):
            return lambda p: jnp.sum(
                m.apply({"params": p}, img, x, t) * wgt)

        gu = jax.grad(loss(plain))(params)
        gp = jax.grad(loss(packd))(params)
        # atol floor: biases feeding InstanceNorm have a TRUE gradient of
        # exactly zero (the norm subtracts the mean), so both sides are
        # ~1e-12 reassociation noise there — a pure relative metric would
        # divide noise by noise.
        bad = jax.tree.map(
            lambda a_, b_: float(
                (jnp.abs(a_ - b_) - 1e-9 - 1e-7 * jnp.abs(a_)).max()),
            gu, gp)
        worst = max(jax.tree_util.tree_leaves(bad))
        assert worst < 0, worst


def test_packed_swin_int8_smoke():
    """quantize=True on the packed model runs end-to-end and tracks the
    float output (W8A8 is approximate; assert strong correlation)."""
    _, packd = _swin_models()
    from diff_unet_tpu.models.swin_unetr import DiffSwinUNETR
    quant = DiffSwinUNETR(out_channels=2, in_channels=1,
                          image_size=(32, 32, 32), feature_size=12,
                          pack=F, quantize=True)
    img = jax.random.normal(jax.random.key(1), (1, 32, 32, 32, 1))
    x = jax.random.normal(jax.random.key(2), (1, 32, 32, 32, 2))
    t = jnp.array([7], jnp.int32)
    params = packd.init(jax.random.key(0), img, x, t)["params"]
    want = packd.apply({"params": params}, img, x, t)
    got, _ = quant.apply({"params": params}, img, x, t, mutable=["quant"])
    a = np.asarray(want).ravel()
    b = np.asarray(got).ravel()
    corr = float(np.corrcoef(a, b)[0, 1])
    assert corr > 0.99, corr


def test_swin_offline_quantization_record():
    """quantize_inference_params must handle deep pyramids: its weight-
    record apply at 16^3 collapses the Swin decoder grid (patch-embed + 3
    merges = /16) and must retry at a larger record size (regression:
    TypeError concat (1,2,2,2,C) vs (1,1,1,1,C))."""
    from diff_unet_tpu.api import DiffusionSegmenter
    from diff_unet_tpu.engine.quantize import quantize_inference_params
    from diff_unet_tpu.models.swin_unetr import DiffSwinUNETR

    from diff_unet_tpu.engine.quantize import _partition

    seg = DiffusionSegmenter(
        module=DiffSwinUNETR(out_channels=2, in_channels=1,
                             image_size=(32, 32, 32), feature_size=12,
                             pack=F, quantize=True),
        num_classes=2, sample_steps=2,
    )
    params = seg.init(jax.random.key(0), (1, 32, 32, 32, 1))
    merged = quantize_inference_params(seg, params)
    assert "quant" in merged
    img = jax.random.normal(jax.random.key(1), (1, 32, 32, 32, 1))
    x = jax.random.normal(jax.random.key(2), (1, 32, 32, 32, 2))
    t = jnp.array([5], jnp.int32)
    offline = seg.module.apply(merged, img, x, t, method="denoise")
    ingraph, v = seg.module.apply(params, img, x, t, method="denoise",
                                  mutable=["quant"])
    # the semantic invariant: the recorded int8 kernels equal what the
    # in-graph path quantizes, bitwise; the f32 scales to float tolerance
    # (two separately-compiled XLA programs may reassociate the abs-max
    # reduction — observed cross-program delta ~1e-10).
    qw_in = _partition(dict(v["quant"]), lambda k: k.endswith("wq"))
    flat_off = dict(jax.tree_util.tree_flatten_with_path(merged["quant"])[0])
    for path, leaf_in in jax.tree_util.tree_flatten_with_path(qw_in)[0]:
        leaf_off = flat_off[path]
        if np.asarray(leaf_in).dtype == np.int8:
            delta = np.abs(np.asarray(leaf_off, np.int32)
                           - np.asarray(leaf_in, np.int32))
            assert delta.max() <= 1, delta.max()          # tie flips only
            assert (delta != 0).mean() < 1e-3, (delta != 0).mean()
        else:
            np.testing.assert_allclose(np.asarray(leaf_off),
                                       np.asarray(leaf_in), rtol=1e-6)
    # output parity: the scale noise passes through LayerNorm/InstanceNorm
    # stacks, so cross-program outputs are close, not bitwise (the bitwise
    # offline==in-graph pin lives in test_packed.py on the DiffUNet family)
    np.testing.assert_allclose(np.asarray(offline), np.asarray(ingraph),
                               rtol=0.05, atol=0.02)
