"""Loop-closure stage: pairwise Sim(3) sheet alignment + pose-graph solve.

Golden-value style: synthetic scenes give exact coordinate maps; injecting a
known smooth per-frame Sim(3) drift into maps + poses must be recovered by
the stage up to the (anchored) global gauge.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from acezero_tpu.data.synthetic import render_scene, scene_coordinate_maps
from acezero_tpu.reconstruct.loopclose import (
    LoopCloseConfig,
    _sim3_inv,
    _sim3_mul,
    loop_close_core,
    pairwise_sim3,
    select_pairs,
    solve_pose_graph,
    view_overlap_matrix,
)


def _synth_features(maps_true, dim=48, seed=0):
    """Random-Fourier features of the TRUE surface points: a stand-in for
    encoder features with exact correspondence signal (image content does
    not move when a sheet drifts, so drifted sheets keep their original
    features)."""
    rng = np.random.default_rng(seed)
    freqs = rng.normal(size=(3, dim)) * rng.uniform(1.0, 6.0, dim)
    phase = rng.uniform(0, 2 * np.pi, dim)
    f = np.sin(maps_true @ freqs + phase)
    return (f / np.linalg.norm(f, axis=-1, keepdims=True)).astype(np.float32)


def _overlap(scene, maps):
    """Mutual view-overlap matrix of a synthetic scene's exact maps."""
    import jax.numpy as jnp

    n, h, w = maps.shape[:3]
    pts = jnp.asarray(maps.reshape(n, -1, 3), jnp.float32)
    valid = jnp.ones((n, h * w), bool)
    w2c = jnp.asarray(
        np.linalg.inv(scene.poses_c2w.astype(np.float64)), jnp.float32
    )
    H, W = scene.images_u8.shape[1:3]
    return np.asarray(
        view_overlap_matrix(
            pts, valid, w2c,
            jnp.full((n,), scene.focal, jnp.float32),
            jnp.asarray(W / 2.0, jnp.float32), jnp.asarray(H / 2.0, jnp.float32),
            jnp.asarray(float(H), jnp.float32), jnp.asarray(float(W), jnp.float32),
            jnp.asarray(0.1, jnp.float32),
        )
    )


def _rand_sim3(rng, rot_deg, trans, dscale):
    R = Rotation.from_rotvec(
        rng.normal(size=3) / np.sqrt(3) * np.radians(rot_deg)
    ).as_matrix()
    t = rng.normal(size=3) / np.sqrt(3) * trans
    s = float(np.exp(rng.normal() * dscale))
    return s, R, t


def _smooth_ring_drift(n, rng, rot_deg=4.0, trans=0.15, dscale=0.02):
    """Per-frame Sim(3) drift that grows smoothly along the ring (frame 0
    near identity, mid-ring maximal) — the shape incremental growth
    produces."""
    out = []
    for k in range(n):
        a = np.sin(np.pi * k / n) ** 2  # 0 at both ends of the index range
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * np.radians(rot_deg) * a
        R = Rotation.from_rotvec(w).as_matrix()
        t = rng.normal(size=3) / np.sqrt(3) * trans * a
        s = float(np.exp(rng.normal() * dscale * a))
        out.append((s, R, t))
    return out


def test_pose_graph_recovers_exact_measurements():
    rng = np.random.default_rng(3)
    n = 24
    S = _smooth_ring_drift(n, rng)
    # ring pairs: +-1, +-2 neighbors
    pairs = []
    for k in range(n):
        for d in (1, 2, n - 1, n - 2):
            pairs.append((k, (k + d) % n))
    pairs = np.asarray(pairs)
    m_s, m_R, m_t = [], [], []
    for i, j in pairs:
        M = _sim3_mul(_sim3_inv(S[j]), S[i])  # S_i = S_j ∘ M_ij
        m_s.append(M[0])
        m_R.append(M[1])
        m_t.append(M[2])
    s_hat, R_hat, t_hat, diag = solve_pose_graph(
        n, pairs, np.asarray(m_s), np.stack(m_R), np.stack(m_t),
        np.ones(len(pairs)),
    )
    # gauge: anchored at frame 0 -> expected S_0^{-1} ∘ S_i
    G = _sim3_inv(S[0])
    for k in range(n):
        s_e, R_e, t_e = _sim3_mul(G, S[k])
        assert abs(s_hat[k] - s_e) < 1e-3
        assert np.degrees(
            np.linalg.norm(Rotation.from_matrix(R_hat[k] @ R_e.T).as_rotvec())
        ) < 0.1
        assert np.linalg.norm(t_hat[k] - t_e) < 5e-3
    assert diag["residual_rot_deg"] < 0.05
    assert diag["residual_t"] < 1e-3


def test_pose_graph_robust_to_outlier_edges():
    rng = np.random.default_rng(5)
    n = 20
    S = _smooth_ring_drift(n, rng)
    pairs, m_s, m_R, m_t = [], [], [], []
    for k in range(n):
        for d in (1, 2, n - 1, n - 2):
            i, j = k, (k + d) % n
            M = _sim3_mul(_sim3_inv(S[j]), S[i])
            pairs.append((i, j))
            m_s.append(M[0])
            m_R.append(M[1])
            m_t.append(M[2])
    # corrupt 10% of edges badly
    idx_bad = rng.choice(len(pairs), len(pairs) // 10, replace=False)
    for e in idx_bad:
        s_b, R_b, t_b = _rand_sim3(rng, 40.0, 1.0, 0.2)
        m_s[e], m_R[e], m_t[e] = s_b, R_b, t_b
    s_hat, R_hat, t_hat, _ = solve_pose_graph(
        n, np.asarray(pairs), np.asarray(m_s), np.stack(m_R), np.stack(m_t),
        np.ones(len(pairs)),
    )
    G = _sim3_inv(S[0])
    errs_t, errs_r = [], []
    for k in range(n):
        s_e, R_e, t_e = _sim3_mul(G, S[k])
        errs_t.append(np.linalg.norm(t_hat[k] - t_e))
        errs_r.append(np.degrees(
            np.linalg.norm(Rotation.from_matrix(R_hat[k] @ R_e.T).as_rotvec())
        ))
    assert np.median(errs_t) < 0.02
    assert np.median(errs_r) < 0.5


@pytest.fixture(scope="module")
def ring_scene():
    return render_scene(16, h=96, w=128, focal=120.0, seed=11, look="across",
                        n_occluders=0)


def test_pairwise_sim3_recovers_known_offset(ring_scene):
    import jax.numpy as jnp

    scene = ring_scene
    maps = scene_coordinate_maps(scene)  # (N, 12, 16, 3)
    n, h, w = maps.shape[:3]
    rng = np.random.default_rng(7)
    # pick the most co-visible pair ("across" cameras look in near-random
    # directions; index adjacency does not imply overlap)
    mutual = np.minimum(_overlap(scene, maps), _overlap(scene, maps).T)
    np.fill_diagonal(mutual, -1)
    i, j = np.unravel_index(np.argmax(mutual), mutual.shape)
    assert mutual[i, j] > 0.5
    D = _rand_sim3(rng, 5.0, 0.2, 0.03)  # drift of frame j's sheet
    # frame j's sheet + pose move together by D
    Xj = (D[0] * maps[j] @ D[1].T) + D[2]
    c2w_j = scene.poses_c2w[j].astype(np.float64)
    c2w_jd = np.eye(4)
    c2w_jd[:3, :3] = D[1] @ c2w_j[:3, :3]
    c2w_jd[:3, 3] = D[0] * D[1] @ c2w_j[:3, 3] + D[2]
    w2c_jd = np.linalg.inv(c2w_jd)

    feats = _synth_features(maps)  # features follow image content, not drift
    res = pairwise_sim3(
        jnp.asarray(maps[i].reshape(1, -1, 3), jnp.float32),
        jnp.asarray(feats[i].reshape(1, -1, feats.shape[-1])),
        jnp.ones((1, h * w), bool),
        jnp.asarray(Xj[None], jnp.float32),
        jnp.asarray(feats[j][None]),
        jnp.ones((1, h, w), bool),
        jnp.asarray(w2c_jd[None], jnp.float32),
        jnp.full((1,), scene.focal, jnp.float32),
        jnp.asarray(128 / 2.0, jnp.float32),
        jnp.asarray(96 / 2.0, jnp.float32),
        jnp.asarray(1e-3, jnp.float32),
        LoopCloseConfig(),
    )
    s_m = float(res["scale"][0])
    R_m = np.asarray(res["R"][0], np.float64)
    t_m = np.asarray(res["t"][0], np.float64)
    # expected M: Xj_sheet = D(X_true) and Xi_sheet = X_true -> M = D.
    # Tolerances at this deliberately coarse canvas (12x16 cells, ~20 cm
    # cell size) check the mechanism; precision at realistic cell sizes is
    # covered by test_loop_close_core_drains_ring_drift_midres.
    assert abs(s_m - D[0]) < 2e-2
    assert np.degrees(
        np.linalg.norm(Rotation.from_matrix(R_m @ D[1].T).as_rotvec())
    ) < 1.0
    assert np.linalg.norm(t_m - D[2]) < 0.05
    assert int(res["n_inliers"][0]) > 50


def _umeyama(src, dst):
    """Similarity alignment of point sets (the real metric's gauge)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    U, D, Vt = np.linalg.svd(dc.T @ sc / len(src))
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = np.trace(np.diag(D) @ S) / ((sc**2).sum() / len(src))
    return s, R, mu_d - s * R @ mu_s


def _drift_drain_errors(scene, maps, cfg, rot_deg=5.0, trans=0.2):
    """Inject smooth ring drift into sheets+poses, run loop_close_core, and
    return per-frame (trans, rot-deg) errors after similarity alignment —
    the same gauge the @5cm/5deg evaluation uses."""
    n, h, w = maps.shape[:3]
    rng = np.random.default_rng(17)
    S_true = _smooth_ring_drift(n, rng, rot_deg=rot_deg, trans=trans, dscale=0.02)
    coords = np.empty_like(maps)
    w2c_scene = np.empty((n, 4, 4))
    for k in range(n):
        Sinv = _sim3_inv(S_true[k])
        coords[k] = (Sinv[0] * maps[k] @ Sinv[1].T) + Sinv[2]
        c2w = scene.poses_c2w[k].astype(np.float64)
        c2w_d = np.eye(4)
        c2w_d[:3, :3] = Sinv[1] @ c2w[:3, :3]
        c2w_d[:3, 3] = Sinv[0] * Sinv[1] @ c2w[:3, 3] + Sinv[2]
        w2c_scene[k] = np.linalg.inv(c2w_d)

    H, W = scene.images_u8.shape[1:3]
    s_all, R_all, t_all, diag = loop_close_core(
        coords.astype(np.float32),
        _synth_features(maps),
        np.ones((n, h, w), bool),
        w2c_scene,
        np.full(n, 5000.0),
        np.full(n, scene.focal, np.float32),
        (H, W),
        conf_threshold=500.0,
        cfg=cfg,
    )
    assert "skipped" not in diag
    c2w_corr = np.empty((n, 4, 4))
    for k in range(n):
        c2w = np.linalg.inv(w2c_scene[k])
        c2w_corr[k] = np.eye(4)
        c2w_corr[k][:3, :3] = R_all[k] @ c2w[:3, :3]
        c2w_corr[k][:3, 3] = s_all[k] * R_all[k] @ c2w[:3, 3] + t_all[k]
    s_g, R_g, t_g = _umeyama(
        c2w_corr[:, :3, 3], scene.poses_c2w[:, :3, 3].astype(np.float64)
    )
    errs_t, errs_r = [], []
    for k in range(n):
        gt = scene.poses_c2w[k].astype(np.float64)
        errs_t.append(
            np.linalg.norm(s_g * R_g @ c2w_corr[k][:3, 3] + t_g - gt[:3, 3])
        )
        errs_r.append(np.degrees(np.linalg.norm(Rotation.from_matrix(
            R_g @ c2w_corr[k][:3, :3] @ gt[:3, :3].T
        ).as_rotvec())))
    return np.asarray(errs_t), np.asarray(errs_r), diag


def test_loop_close_core_drains_ring_drift():
    """Fast smoke at a deliberately coarse canvas (12x16 cells, ~20 cm cell
    size): injected ~20 cm / 5 deg ring drift must shrink substantially.
    Precision bounds live in the midres variant below."""
    scene = render_scene(20, h=96, w=128, focal=120.0, seed=13, look="across",
                        n_occluders=0)
    maps = scene_coordinate_maps(scene)  # exact (N, 12, 16, 3)
    errs_t, errs_r, diag = _drift_drain_errors(
        scene, maps,
        LoopCloseConfig(min_pair_points=30, own_reproj_px=50.0, sample_step=1),
    )
    # injected drift medians ~10 cm / 2.5 deg at this gauge
    assert np.median(errs_t) < 0.08, (np.median(errs_t), errs_t)
    assert np.median(errs_r) < 3.5, (np.median(errs_r), errs_r)
    assert diag["median_corr_t"] > 0.01  # it actually did something


@pytest.mark.slow
def test_loop_close_core_drains_ring_drift_midres():
    """Drift drain at a realistic relative cell size (24x32 cells of a
    192x256 canvas ~ the 60x80 cells of the production 480x640 canvas):
    injected ~20 cm / 5 deg ring drift must come down to a few cm."""
    scene = render_scene(20, h=192, w=256, focal=240.0, seed=13, look="across",
                         n_occluders=0)
    maps = scene_coordinate_maps(scene)
    errs_t, errs_r, diag = _drift_drain_errors(
        scene, maps,
        LoopCloseConfig(min_pair_points=30, own_reproj_px=50.0, sample_step=2),
    )
    # measured (2026-08): med_t 3.6 cm, max_t 16 cm, med_r 1.05 deg
    assert np.median(errs_t) < 0.05, (np.median(errs_t), errs_t)
    assert np.median(errs_r) < 2.0, (np.median(errs_r), errs_r)
    assert np.max(errs_t) < 0.25
    assert diag["median_corr_t"] > 0.01


def test_select_pairs_by_overlap():
    # ring co-visibility encoded directly: +-1 neighbors 0.8, +-2 0.4
    m = 12
    O = np.zeros((m, m))
    for i in range(m):
        O[i, (i + 1) % m] = O[i, (i - 1) % m] = 0.8
        O[i, (i + 2) % m] = O[i, (i - 2) % m] = 0.4
    # one-directional overlap must not make a pair (mutual = min)
    O[0, 6] = 0.95
    pairs = select_pairs(O, 2)
    assert len(pairs) == 24
    for i, j in pairs:
        d = min((j - i) % m, (i - j) % m)
        assert d in (1, 2)  # ring neighbors only

    # min_overlap floor drops weak edges
    pairs4 = select_pairs(O, 4, min_overlap=0.5)
    for i, j in pairs4:
        assert min((j - i) % m, (i - j) % m) == 1


def test_view_overlap_matrix_outward_ring():
    """On an outward-looking ring, index neighbors overlap and opposite
    frames do not."""
    scene = render_scene(12, h=96, w=128, focal=120.0, seed=21, look="outward",
                         n_occluders=0)
    maps = scene_coordinate_maps(scene)
    O = _overlap(scene, maps)
    mutual = np.minimum(O, O.T)
    near = [mutual[i, (i + 1) % 12] for i in range(12)]
    far = [mutual[i, (i + 6) % 12] for i in range(12)]
    assert np.median(near) > 0.15
    assert np.median(far) < 0.05
