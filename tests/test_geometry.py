"""Golden-value and round-trip tests for the geometry/codec core."""

import jax.numpy as jnp
import numpy as np

from far3d_tpu import geometry as G


def test_lid_binning_roundtrip():
    # one shared impl must agree with itself: bin -> depth -> bin
    dmin, dmax, nbins = 0.1, 110.0, 50
    bins = jnp.arange(nbins, dtype=jnp.float32)
    depths = G.lid_bin_to_depth(bins, dmin, dmax, nbins)
    back = G.lid_depth_to_bin(depths, dmin, dmax, nbins)
    np.testing.assert_allclose(np.asarray(back), np.asarray(bins),
                               rtol=1e-4, atol=1e-3)
    # golden values from the reference formula (farhead.py:524-527):
    # bin_size = 2*(110-0.1)/(50*51); depth(i) = 0.1 + bs/8*((i/0.5+1)^2 - 1)
    bs = 2 * (110.0 - 0.1) / (50 * 51)
    assert abs(float(depths[0]) - 0.1) < 1e-5
    assert abs(float(depths[1]) - (0.1 + bs / 8 * (9 - 1))) < 1e-4


def test_lid_target_overflow():
    dmin, dmax, nbins = 0.1, 110.0, 50
    d = jnp.asarray([0.0, 5.0, 200.0, jnp.inf, jnp.nan])
    t = G.lid_depth_to_bin(d, dmin, dmax, nbins, target=True)
    t = np.asarray(t)
    assert t[0] == nbins          # below range -> overflow bin
    assert 0 <= t[1] < nbins
    assert t[2] == nbins and t[3] == nbins and t[4] == nbins


def test_bbox_codec_roundtrip():
    rng = np.random.RandomState(0)
    boxes = np.concatenate([
        rng.uniform(-100, 100, (7, 3)),       # center
        rng.uniform(0.5, 8, (7, 3)),          # sizes
        rng.uniform(-np.pi, np.pi, (7, 1)),   # yaw
        rng.uniform(-5, 5, (7, 2)),           # velocity
    ], axis=1).astype(np.float32)
    code = G.normalize_bbox(jnp.asarray(boxes))
    back = np.asarray(G.denormalize_bbox(code))
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], rtol=1e-4, atol=1e-4)
    # yaw equal modulo 2pi
    dyaw = np.mod(back[:, 6] - boxes[:, 6] + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(dyaw, 0, atol=1e-4)
    np.testing.assert_allclose(back[:, 7:], boxes[:, 7:], atol=1e-4)


def test_pos2posemb3d_structure():
    # matches positional_encoding.py:13-25: output order [emb_y, emb_x, emb_z],
    # interleaved sin/cos of pos*2pi / temperature^(2*floor(i/2)/128)
    pos = jnp.asarray([[0.25, 0.5, 0.75]])
    emb = np.asarray(G.pos2posemb3d(pos, num_pos_feats=128))
    assert emb.shape == (1, 384)
    # first element is sin(0.5 * 2pi / 1) == sin(pi) ~ 0 (y first)
    np.testing.assert_allclose(emb[0, 0], np.sin(0.5 * 2 * np.pi), atol=1e-5)
    np.testing.assert_allclose(emb[0, 1], np.cos(0.5 * 2 * np.pi), atol=1e-5)
    np.testing.assert_allclose(emb[0, 128], np.sin(0.25 * 2 * np.pi), atol=1e-5)


def test_nerf_encoding_shape():
    x = jnp.zeros((2, 15))
    e = G.nerf_positional_encoding(x)
    assert e.shape == (2, 180)
    # sin(0)=0, cos(0)=1 pattern
    e = np.asarray(e)
    assert np.allclose(e[:, :15], 0) and np.allclose(e[:, 15:30], 1)


def test_projection_unprojection_roundtrip():
    rng = np.random.RandomState(1)
    # random invertible camera
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 400.0
    intr[0, 2], intr[1, 2] = 480, 320
    pts = np.stack([rng.uniform(-20, 20, 50), rng.uniform(-12, 12, 50),
                    rng.uniform(2, 60, 50)], axis=1).astype(np.float32)
    # lidar2img = intr (camera frame == ego frame)
    uv, depth = G.project_to_image(jnp.asarray(pts), jnp.asarray(intr))
    back = G.unproject_to_lidar(uv, depth, jnp.asarray(np.linalg.inv(intr)))
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-3, atol=1e-3)


def test_transform_points_se3():
    rng = np.random.RandomState(2)
    th = 0.5
    m = np.eye(4, dtype=np.float32)
    m[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    m[:3, 3] = [1, 2, 3]
    pts = rng.randn(1, 10, 3).astype(np.float32)
    out = np.asarray(G.transform_points(jnp.asarray(pts),
                                        jnp.asarray(m)[None]))
    want = (pts @ m[:3, :3].T) + m[:3, 3]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_location_grid():
    # misc.py:57-84: x = (col*stride + stride//2)/pad_w
    g = np.asarray(G.location_grid(2, 3, 8, 16, 24))
    assert g.shape == (2, 3, 2)
    np.testing.assert_allclose(g[0, 0], [4 / 24, 4 / 16])
    np.testing.assert_allclose(g[1, 2], [(16 + 4) / 24, (8 + 4) / 16])
