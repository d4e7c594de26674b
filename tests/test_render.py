"""Golden-pixel forward tests for the full rasterize pipeline.

Values pinned by the reference CUDA implementation (test/test_rasterize.py,
test/test_depth.py) on the shared 6-gaussian fixture.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.rasterize import rasterize, render_depth
from tests import fixtures as fx

CAP = 1 << 18


@pytest.fixture
def scene():
    return fx.test_scene(opacity_presigmoid=True)


def _render(scene, n_sh_band=0, sh=None, background=None,
            use_sh_precompute=True):
    params = scene.params()
    if sh is not None:
        params = dict(params)
        params["sh"] = params["sh"].at[:6, :, : sh.shape[2]].set(sh)
    bg = background if background is not None else jnp.zeros(3, jnp.float32)
    return rasterize(
        params, scene.alive, fx.test_camera_T_world(), fx.test_camera(),
        near_thresh=0.3, far_thresh=100.0, cull_mask_padding=10.0,
        mh_dist=3.0, background_rgb=bg, n_sh_band=n_sh_band,
        use_sh_precompute=use_sh_precompute,
        splat_capacity=CAP, chunk=256,
    )


def test_rasterize_no_sh(scene):
    res = _render(scene)
    img = np.asarray(res.image)
    assert img.shape == (480, 640, 3)
    # near red gaussian centre (test_rasterize.py:47-49)
    np.testing.assert_allclose(
        img[340, 348], [0.47698545455932617, 0.0, 0.0], atol=1e-5
    )
    # red/blue overlap, blue in front (test_rasterize.py:52-54)
    np.testing.assert_allclose(
        img[200, 348],
        [0.03330837935209274, 0.0, 0.267561137676239],
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(res.visible), [False, False, False, True, True, True]
    )


def test_rasterize_full_sh_precompute(scene):
    """SH-precompute render against self-goldens (standard SH basis).

    NOTE: the reference's own golden values for this test
    (test_rasterize.py:85-92) do NOT match its shipped SH header: they were
    generated with the band-1 variant of analytic_diff.ipynb cell 24
    (basis (-x, +y, -z) against coefficients 1..3) while
    src/spherical_harmonics.cuh:7-11 ships the standard real-SH ordering
    ((-y, +z, -x)).  Both golden pixels are reproduced to 4+ decimals under
    the notebook variant (sum(basis[1:]) = 0.6214 / 1.2706 at the two
    fixture view dirs) and are off by ~1.0 under the shipped header.  We
    implement the shipped header (standard basis — what the published
    training results used) and pin values cross-checked against the f64
    jnp oracle.
    """
    sh = jnp.full((6, 3, 15), 0.1, jnp.float32)
    res = _render(scene, n_sh_band=3, sh=sh)
    img = np.asarray(res.image)
    np.testing.assert_allclose(
        img[340, 348],
        [0.63314533, 0.15615983, 0.15615983],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        img[200, 348],
        [0.17941597, 0.14610565, 0.41366684],
        atol=1e-5,
    )


def test_background_blend(scene):
    bg = jnp.array([0.25, 0.5, 0.75], jnp.float32)
    res = _render(scene, background=bg)
    img = np.asarray(res.image)
    # a pixel far from all splats is pure background
    np.testing.assert_allclose(img[470, 10], [0.25, 0.5, 0.75], atol=1e-6)


def test_render_depth(scene):
    depth = render_depth(
        scene.params(), scene.alive, fx.test_camera_T_world(),
        fx.test_camera(), alpha_threshold=0.2, near_thresh=0.3,
        cull_mask_padding=10.0, mh_dist=3.0, splat_capacity=CAP, chunk=256,
    )
    d = np.asarray(depth)
    assert d.shape == (480, 640, 1)
    # (test_depth.py:32-36)
    np.testing.assert_allclose(d[340, 348, 0], 17.29551887512207, atol=1e-4)
    np.testing.assert_allclose(d[200, 348, 0], 13.205718040466309, atol=1e-4)
    # never-crossed pixels stay -1
    assert d[470, 10, 0] == -1.0


def test_rasterize_full_sh_per_pixel(scene):
    """Per-pixel-SH render against f64 brute-force oracle goldens.

    Like test_rasterize_full_sh_precompute, the reference's golden values
    for this path (test_rasterize.py:124-131) were generated under the
    notebook basis variant, not the shipped standard-basis SH header we
    implement; these values are pinned by an independent float64 per-pixel
    compositing oracle (agreement ~5e-6) and sit ~0.1*sum(basis) away from
    the reference numbers, exactly like the precompute case.
    """
    sh = jnp.full((6, 3, 15), 0.1, jnp.float32)
    res = _render(scene, n_sh_band=3, sh=sh, use_sh_precompute=False)
    img = np.asarray(res.image)
    np.testing.assert_allclose(
        img[340, 348], [0.63091441, 0.15392897, 0.15392897], atol=1e-5
    )
    np.testing.assert_allclose(
        img[200, 348], [0.14358045, 0.11027012, 0.37783123], atol=1e-5
    )


def test_per_pixel_sh_dc_only_matches_dc_path(scene):
    """With zero higher-band coefficients, the per-pixel SH kernel must
    reproduce the DC kernel exactly (basis row 0 is the constant SH_0)."""
    res_pp = _render(
        scene, n_sh_band=3,
        sh=jnp.zeros((6, 3, 15), jnp.float32),
        use_sh_precompute=False,
    )
    res_dc = _render(scene)
    np.testing.assert_allclose(
        np.asarray(res_pp.image), np.asarray(res_dc.image), atol=1e-6
    )


def test_per_pixel_sh_grads(scene):
    """Gradients flow through the per-pixel SH kernel into every parameter
    leaf, and the sh gradient is zero exactly where gaussians are culled."""
    import jax

    params = scene.params()

    def loss(p):
        res = rasterize(
            p, scene.alive, fx.test_camera_T_world(), fx.test_camera(),
            near_thresh=0.3, far_thresh=100.0, cull_mask_padding=10.0,
            mh_dist=3.0, background_rgb=jnp.zeros(3, jnp.float32),
            n_sh_band=3, use_sh_precompute=False,
            splat_capacity=CAP, chunk=256,
        )
        return jnp.sum(res.image**2), res.visible

    (_, visible), g = jax.value_and_grad(loss, has_aux=True)(params)
    vis = np.asarray(visible)
    for name in ("xyz", "rgb", "opacity", "scale", "quaternion", "sh"):
        arr = np.asarray(g[name])
        assert np.isfinite(arr).all(), name
        assert np.abs(arr[vis]).sum() > 0, name
        assert np.abs(arr[~vis]).sum() == 0, name


def test_bf16_kernel_precision_close_to_f32(scene):
    """kernel_precision="bf16" packs the layout's sort value operands into
    bf16 pairs (compaction + candidate sorts: feature rows, with splat
    centres carried tile-locally; gradient-reduction sorts: gradient rows
    — see culling._layout_impl / _reduce_splat_grads).  The kernels
    themselves still run f32 matmuls.  Images must stay within
    bf16-roundoff of the f32 path and gradients must stay finite with the
    same visibility mask."""
    import jax

    params = scene.params()

    def render(precision):
        return rasterize(
            params, scene.alive, fx.test_camera_T_world(), fx.test_camera(),
            near_thresh=0.3, far_thresh=100.0, cull_mask_padding=10.0,
            mh_dist=3.0, background_rgb=jnp.zeros(3, jnp.float32),
            n_sh_band=0, splat_capacity=CAP, chunk=256,
            kernel_precision=precision,
        )

    f32 = np.asarray(render("f32").image)
    b16 = np.asarray(render("bf16").image)
    assert np.abs(f32 - b16).max() < 2e-2, np.abs(f32 - b16).max()

    def loss(p):
        res = rasterize(
            p, scene.alive, fx.test_camera_T_world(), fx.test_camera(),
            near_thresh=0.3, far_thresh=100.0, cull_mask_padding=10.0,
            mh_dist=3.0, background_rgb=jnp.zeros(3, jnp.float32),
            n_sh_band=0, splat_capacity=CAP, chunk=256,
            kernel_precision="bf16",
        )
        return jnp.sum(res.image**2), res.visible

    (_, visible), g = jax.value_and_grad(loss, has_aux=True)(params)
    vis = np.asarray(visible)
    for name in ("xyz", "rgb", "opacity", "scale", "quaternion"):
        arr = np.asarray(g[name])
        assert np.isfinite(arr).all(), name
        assert np.abs(arr[vis]).sum() > 0, name
        assert np.abs(arr[~vis]).sum() == 0, name
