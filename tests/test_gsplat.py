import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.ops.gsplat import (
    project_gaussians, quat_to_rotmat, render_gaussians)


def identity_cam(hw=(64, 64), f=60.0):
    h, w = hw
    K = jnp.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], jnp.float32)
    view = jnp.eye(4)
    return K, view, hw


def test_quat_to_rotmat():
    # identity quat
    np.testing.assert_allclose(np.asarray(quat_to_rotmat(
        jnp.array([1.0, 0, 0, 0]))), np.eye(3), atol=1e-6)
    # 90 deg about z
    q = jnp.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    R = np.asarray(quat_to_rotmat(q))
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)


def test_single_gaussian_center_and_alpha():
    K, view, hw = identity_cam()
    means = jnp.array([[0.0, 0.0, 5.0]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), 0.3)
    op = jnp.array([0.9])
    col = jnp.array([[1.0, 0.2, 0.1]])
    color, alpha, depth = render_gaussians(means, quats, scales, op, col,
                                           view, K, hw)
    cy, cx = 32, 32
    # peak alpha at the projected center ~= opacity
    assert abs(float(alpha[cy, cx]) - 0.9) < 0.02
    # color at center ~= op * col
    np.testing.assert_allclose(np.asarray(color[cy, cx]),
                               0.9 * np.asarray(col[0]), atol=0.03)
    # expected depth ~= 5
    assert abs(float(depth[cy, cx]) - 5.0) < 1e-3
    # corners empty
    assert float(alpha[0, 0]) == 0.0


def test_depth_ordering_occlusion():
    K, view, hw = identity_cam()
    # near red gaussian occludes far blue one on the same ray
    means = jnp.array([[0.0, 0.0, 10.0], [0.0, 0.0, 3.0]])
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    scales = jnp.full((2, 3), 0.3)
    op = jnp.array([0.99, 0.99])
    col = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    color, alpha, depth = render_gaussians(means, quats, scales, op, col,
                                           view, K, hw)
    c = np.asarray(color[32, 32])
    assert c[0] > 0.9 and c[2] < 0.05  # red wins
    # expected depth ~3 with a small contribution from the leaking far
    # gaussian (alpha-weighted mean)
    assert abs(float(depth[32, 32]) - 3.0) < 0.2


def test_culling():
    K, view, hw = identity_cam()
    means = jnp.array([[0.0, 0.0, -5.0], [50.0, 0.0, 2.0]])  # behind; offscreen
    proj = project_gaussians(means, jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1)),
                             jnp.full((2, 3), 0.1), view, K, hw)
    assert not bool(proj.valid.any())


def test_alpha_composition_sums():
    K, view, hw = identity_cam()
    rng = np.random.default_rng(0)
    n = 50
    means = jnp.asarray(np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                                  rng.uniform(3, 8, n)], -1), jnp.float32)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    scales = jnp.full((n, 3), 0.2)
    op = jnp.full((n,), 0.8)
    col = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    color, alpha, depth = render_gaussians(means, quats, scales, op, col,
                                           view, K, hw)
    a = np.asarray(alpha)
    assert (a <= 1.0 + 1e-5).all() and a.max() > 0.5
    # color bounded by alpha (convex combination of colors in [0,1])
    assert (np.asarray(color).max(-1) <= a + 1e-4).all()


def test_gradients_flow_to_all_params():
    K, view, hw = identity_cam((32, 32), f=30.0)

    def loss(means, scales, op, col):
        quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (means.shape[0], 1))
        color, alpha, _ = render_gaussians(means, quats, scales, op, col,
                                           view, K, hw)
        return jnp.sum((color - 0.5) ** 2) + jnp.sum(alpha ** 2)

    means = jnp.array([[0.1, -0.1, 4.0], [0.3, 0.2, 6.0]])
    scales = jnp.full((2, 3), 0.3)
    op = jnp.array([0.7, 0.6])
    col = jnp.full((2, 3), 0.4)
    g = jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, op, col)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
        assert float(jnp.abs(gi).sum()) > 0


def test_background_composite():
    K, view, hw = identity_cam()
    # empty scene -> pure background
    means = jnp.zeros((1, 3)).at[0, 2].set(-1.0)  # culled
    color, alpha, _ = render_gaussians(
        means, jnp.array([[1.0, 0, 0, 0]]), jnp.full((1, 3), 0.1),
        jnp.array([0.5]), jnp.array([[1.0, 0, 0]]), view, K, hw,
        background=jnp.array([0.2, 0.4, 0.6]))
    np.testing.assert_allclose(np.asarray(color[10, 10]), [0.2, 0.4, 0.6],
                               atol=1e-5)


def test_degenerate_gaussian_grads_finite_under_scan():
    """Round-5 NaN regression (the GSM overfit freeze): a needle gaussian
    (scale ratio ~1e4) near the camera plus behind-camera gaussians must
    yield FINITE grads both per-view and under a lax.map over views (the
    failing fusion: masked negative-sigma rows overflowed exp(-sigma) and
    0*inf leaked NaN through the where/min backward; behind-camera rows
    overflowed the projection Jacobian before z sanitization)."""
    h, w = 48, 64
    K = jnp.array([[55.0, 0, w / 2], [0, 55.0, h / 2], [0, 0, 1]],
                  jnp.float32)
    views = jnp.stack([jnp.eye(4),
                       jnp.eye(4).at[2, 3].set(6.0)])  # one cam mid-scene
    means = jnp.array([[0.0, 0.0, 3.0],      # normal, in front
                       [0.5, -0.2, 5.0],     # needle
                       [0.0, 0.0, -2.0],     # behind cam 0
                       [0.1, 0.1, 6.5]])     # behind cam 1 (z'=0.5 for cam0)
    quats = jnp.tile(jnp.array([[0.9, 0.1, -0.3, 0.27]]), (4, 1))
    scales = jnp.array([[0.3, 0.3, 0.3],
                        [29.0, 0.004, 0.06],  # the measured needle shape
                        [0.4, 0.4, 0.4],
                        [1.0, 0.01, 0.5]])
    op = jnp.array([0.7, 0.002, 0.5, 0.9])
    col = jnp.full((4, 3), 0.5)

    def one_view(viewmat, m, q, s, o, c):
        rgb, a, d = render_gaussians(m, q, s, o, c, viewmat, K, (h, w))
        return jnp.sum(rgb) + jnp.sum(a) + 0.1 * jnp.sum(d)

    def loss_map(m, q, s, o, c):
        return jnp.sum(jax.lax.map(
            lambda vm: one_view(vm, m, q, s, o, c), views))

    g = jax.jit(jax.grad(loss_map, argnums=(0, 1, 2, 3, 4)))(
        means, quats, scales, op, col)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all(), gi
    # per-view too
    for vi in range(2):
        g = jax.jit(jax.grad(
            lambda *a: one_view(views[vi], *a), argnums=(0, 1, 2, 3, 4)))(
            means, quats, scales, op, col)
        for gi in g:
            assert np.isfinite(np.asarray(gi)).all(), gi
