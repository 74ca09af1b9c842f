"""MODNet matting: forward shapes, matting_fn hook contract, param IO."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.models.modnet import (MODNet, make_matting_fn,
                                            preprocess_size)


def tiny_model():
    return MODNet(hr_channels=8, backbone_width=0.25)


@pytest.mark.slow
def test_modnet_forward_shapes():
    model = tiny_model()
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    semantic, detail, matte = model.apply(params, x)
    assert semantic.shape == (1, 8, 12, 1)
    assert detail.shape == (1, 64, 96, 1)
    assert matte.shape == (1, 64, 96, 1)
    for t in (semantic, detail, matte):
        a = np.asarray(t)
        assert np.isfinite(a).all() and (a >= 0).all() and (a <= 1).all()


def test_preprocess_size_rule():
    # big image: short side -> ref, snap to /32
    assert preprocess_size(1080, 1920, 512) == (512, 896)
    # small image scaled up
    rh, rw = preprocess_size(100, 200, 512)
    assert rh % 32 == 0 and rw % 32 == 0 and min(rh, rw) >= 480
    # in-range image only snaps
    assert preprocess_size(520, 530, 512) == (512, 512)


def test_matting_fn_hook_contract():
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    fn = make_matting_fn(model, params, ref_size=64)
    img = np.random.default_rng(0).uniform(0, 255, (70, 50, 3)).astype(np.uint8)
    alpha = fn(img)
    assert alpha.shape == (70, 50)
    assert alpha.dtype == np.float32 or alpha.dtype == np.float64
    assert (alpha >= 0).all() and (alpha <= 1).all()


def test_param_save_load_roundtrip(tmp_path):
    from gvfdiffusion_tpu.scripts.matting import load_params, save_params

    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    path = str(tmp_path / "modnet.npz")
    save_params(params, path)
    restored = load_params(model, path)
    x = jnp.ones((1, 64, 64, 3)) * 0.3
    a = model.apply(params, x)[2]
    b = model.apply(restored, x)[2]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_matting_plugs_into_process_video_hook():
    """The pipeline accepts the matting_fn and uses it for RGBA-ization."""
    from gvfdiffusion_tpu.pipelines.trellis_image_to_3d import (
        TrellisConfig, TrellisImageTo3DPipeline,
    )

    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    fn = make_matting_fn(model, params, ref_size=64)
    pipe = TrellisImageTo3DPipeline(
        None, None, None, None, None, None, None, None, None, None,
        TrellisConfig(), matting_fn=fn,
    )
    img = np.full((80, 80, 3), 128, np.uint8)
    pre = pipe.preprocess_image(img)
    assert pre.shape == (518, 518, 3)
    assert np.isfinite(pre).all()
