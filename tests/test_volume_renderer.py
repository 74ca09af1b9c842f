"""Volume renderer test: analytic density sphere."""

import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.render.volume_renderer import render_volume
from gvfdiffusion_tpu.representations.camera import Camera, fov_intrinsics, lookat_extrinsics


def test_volume_renders_density_sphere():
    def field(pts):
        d = jnp.linalg.norm(pts, axis=-1)
        sigma = jnp.where(d < 0.25, 50.0, 0.0)
        color = jnp.broadcast_to(jnp.array([1.0, 0.2, 0.2]), pts.shape)
        return sigma, color

    cam = Camera(
        world_view=jnp.asarray(lookat_extrinsics([0.0, -1.2, 0.0])),
        intrinsics=jnp.asarray(fov_intrinsics(50.0)),
        height=24, width=24, near=0.05, far=10.0,
    )
    out = render_volume(field, cam, num_steps=64, t_near=0.3, t_far=2.5,
                        bg_color=(0.0, 0.0, 0.0), step_chunk=256)
    img = np.asarray(out["render"])
    alpha = np.asarray(out["alpha"])
    assert alpha[12, 12] > 0.95          # opaque at center
    assert alpha[0, 0] < 1e-3            # empty at corner
    assert img[12, 12, 0] > 0.9          # red sphere
    # depth ~ distance to the near surface: 1.2 - 0.25
    np.testing.assert_allclose(np.asarray(out["depth"])[12, 12], 0.95, atol=0.1)
