"""Pose-only bundle adjustment over multi-view feature tracks.

The Sim(3) pose graph (reconstruct/loopclose.py) drains the rigid-per-frame
component of ring drift, but what remains after refit is a NON-rigid bend:
poses and map reach a self-consistent fixed point whose internal stress
(~2 cm graph residual, ~6 cm pairwise sheet rms measured on held-out rings)
per-frame Sim(3) corrections cannot express. The registrar itself is exact
on clean maps (0.0 cm on ray-cast GT, tests/test_registration.py), so the
accuracy ceiling IS this bend.

The one signal unbiased by the bent map is the pixel-pixel correspondence:
the loop-closure matcher's cell matches (feature argmax + sub-cell peak)
depend on the ENCODER's features, not on the head's drifted coordinates.
This module runs a Gauss-Newton bundle adjustment on those matches —
camera poses only, landmarks marginalized by an exact per-track Schur
complement:

  - a TRACK is one source cell (frame i, cell c) plus its matched
    continuous pixel in every pair (i -> j) that matched it. Tracks with
    >= 2 targets span >= 3 frames and rigidly couple the pair baselines —
    pairwise (two-view) landmarks leave a per-pair scale field that is
    numerically unconstrained on near-collinear ring chords (measured:
    3.4 cm residual bend at ZERO reprojection residual); multi-view
    tracks pin it.
  - per iteration: each track's landmark is the closed-form least-squares
    intersection of its observation rays; reprojection residuals get
    Geman-McClure robust weights; the landmark block (3x3) is eliminated
    exactly, producing the (6, 6) camera cross-blocks; the damped
    (6n, 6n) system solves densely (n <= 256 graph frames).
  - gauge fixed by a weak se(3) prior toward the initial poses plus a
    hard anchor on frame 0 (pixel constraints leave a 7-dof similarity
    gauge free).

Everything is one jitted fixed-shape program: tracks ride the MXU as
chunked batched einsums (lax.scan over track chunks bounds memory). No
reference analogue — the reference has no global-consistency machinery at
all (its accuracy comes from forward-scan captures not accumulating
drift; SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from acezero_tpu.utils.precision import f32_matmul


def _skew(v):
    """(..., 3) -> (..., 3, 3) cross-product matrices."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], -1),
            jnp.stack([z, o, -x], -1),
            jnp.stack([-y, x, o], -1),
        ],
        -2,
    )


def _exp_so3(w):
    """Rodrigues exponential for small rotations, (..., 3) -> (..., 3, 3)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    k = w / theta
    K = _skew(k)
    st = jnp.sin(theta)[..., None]
    ct = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + st * K + (1.0 - ct) * (K @ K)


def _rotlog(R):
    """(..., 3, 3) -> (..., 3) rotation log (small-angle safe)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    s = jnp.where(theta > 1e-6, theta / jnp.maximum(2.0 * jnp.sin(theta), 1e-12), 0.5)
    return w * s[..., None]


def tracks_from_pair_matches(
    pair_idx: np.ndarray,  # (E, 2) int (src, tgt) graph-frame indices
    u_src: np.ndarray,  # (E, P, 2) source pixels (same cells for one src frame)
    u_tgt: np.ndarray,  # (E, P, 2) matched target pixels
    ok: np.ndarray,  # (E, P) bool
    max_obs: int = 6,
    min_targets: int = 1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Group pair matches into per-source-cell tracks.

    All pairs sharing a source frame share its source cells (the matcher
    samples the same strided grid), so track formation is pure regrouping —
    no union-find, and no cross-frame cell-quantization merging (which
    would conflate content up to half a cell apart).

    Returns (trk_frame (T, O) int32 with -1 padding, trk_px (T, O, 2),
    trk_ok (T, O) bool); observation 0 is the source cell center.
    """
    E, P = u_src.shape[:2]
    by_src: dict[int, list[int]] = {}
    for e in range(E):
        by_src.setdefault(int(pair_idx[e, 0]), []).append(e)

    n_tgt = max_obs - 1
    frames, pxs, oks = [], [], []
    for i, edges in sorted(by_src.items()):
        # order a frame's outgoing edges by match count so the strongest
        # targets survive the max_obs cap
        edges = sorted(edges, key=lambda e: -int(ok[e].sum()))[:n_tgt]
        k = len(edges)
        f = np.full((P, max_obs), -1, np.int64)
        p = np.zeros((P, max_obs, 2), np.float32)
        o = np.zeros((P, max_obs), bool)
        f[:, 0] = i
        p[:, 0] = u_src[edges[0]]
        o[:, 0] = True
        for c, e in enumerate(edges):
            f[:, 1 + c] = pair_idx[e, 1]
            p[:, 1 + c] = u_tgt[e]
            o[:, 1 + c] = ok[e]
        keep = o[:, 1:].sum(1) >= min_targets
        frames.append(f[keep])
        pxs.append(p[keep])
        oks.append(o[keep])
        del k
    if not frames:
        return (
            np.zeros((0, max_obs), np.int64),
            np.zeros((0, max_obs, 2), np.float32),
            np.zeros((0, max_obs), bool),
        )
    return (
        np.concatenate(frames),
        np.concatenate(pxs),
        np.concatenate(oks),
    )


@partial(jax.jit, static_argnames=("iterations", "chunk"))
@f32_matmul
def pose_ba_core(
    R0,  # (n, 3, 3) world-to-camera rotations (graph frames)
    t0,  # (n, 3) world-to-camera translations
    focals,  # (n,) canvas-pixel focal lengths
    ppx,  # scalar principal point x
    ppy,  # scalar
    trk_frame,  # (T, O) int32 graph-frame index per observation (-1 pad)
    trk_px,  # (T, O, 2) observation pixels (canvas coords)
    trk_ok,  # (T, O) bool
    iterations: int = 30,
    huber_px: float = 4.0,
    # gauge/soft-mode prior. Production matches carry ~2 px noise while the
    # ring-bend modes this stage polishes produce only sub-0.01 px signal
    # (see module docstring): a weak prior lets the solver chase match
    # noise along those modes (measured: 15 cm median pose motion for a
    # 0.08 px rms gain, accuracy DOWN). 1e4 holds soft modes at the
    # initialization while leaving well-measured directions (curvature
    # ~1e6-1e7) data-dominated; measured best @5cm/5deg on held-out rings.
    prior_rot: float = 1e4,
    prior_t: float = 1e4,
    chunk: int = 8192,
):
    """Track bundle adjustment; returns (R (n, 3, 3), t (n, 3), diag).

    The prior pulls toward the INITIAL poses: it fixes the 7-dof gauge,
    keeps unconstrained frames put, and holds the weakly-observable bend
    modes at the initialization (see prior_rot note above). Well-measured
    directions carry 2-3 orders of magnitude more curvature and remain
    data-dominated. Frame 0 is hard-anchored.
    """
    n = R0.shape[0]
    T, O = trk_frame.shape
    # pad tracks to a chunk multiple (padding rows: frame 0, ok False)
    Tp = -(-max(T, 1) // chunk) * chunk
    pad = Tp - T
    fidx = jnp.concatenate([jnp.maximum(trk_frame, 0), jnp.zeros((pad, O), jnp.int32)])
    px = jnp.concatenate([trk_px, jnp.zeros((pad, O, 2), jnp.float32)])
    okb = jnp.concatenate(
        [trk_ok & (trk_frame >= 0), jnp.zeros((pad, O), bool)]
    )
    C = Tp // chunk
    fidx = fidx.reshape(C, chunk, O)
    px = px.reshape(C, chunk, O, 2)
    okb = okb.reshape(C, chunk, O)

    def _track_geometry(R, t, fc, uc, oc):
        """Triangulated landmark + residuals/weights for one track chunk."""
        Rc = R[fc]  # (c, O, 3, 3)
        tc = t[fc]  # (c, O, 3)
        f = focals[fc]  # (c, O)
        cc = -jnp.einsum("coij,coi->coj", Rc, tc)  # camera centers

        d = jnp.stack(
            [
                (uc[..., 0] - ppx) / f,
                (uc[..., 1] - ppy) / f,
                jnp.ones_like(f),
            ],
            -1,
        )
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        dw = jnp.einsum("coji,coj->coi", Rc, d)  # world-frame bearings

        of = oc.astype(jnp.float32)
        # least-squares ray intersection: sum w (I - d d^T)(X - c) = 0
        Pm = jnp.broadcast_to(jnp.eye(3), dw.shape[:-1] + (3, 3)) - (
            dw[..., :, None] * dw[..., None, :]
        )
        Pm = Pm * of[..., None, None]
        A = jnp.sum(Pm, axis=1)  # (c, 3, 3)
        b = jnp.einsum("coij,coj->ci", Pm, cc)
        A = A + 1e-5 * jnp.broadcast_to(jnp.eye(3), A.shape)
        X = jnp.linalg.solve(A, b[..., None])[..., 0]  # (c, 3)

        pc = jnp.einsum("coij,cj->coi", Rc, X) + tc
        z = pc[..., 2]
        z_ok = z > 1e-2
        zs = jnp.maximum(z, 1e-2)
        inv_z = 1.0 / zs
        pr = jnp.stack(
            [f * pc[..., 0] * inv_z + ppx, f * pc[..., 1] * inv_z + ppy], -1
        )
        res = pr - uc  # (c, O, 2)
        r2 = jnp.sum(res * res, -1)
        valid = of * z_ok
        return Rc, f, pc, inv_z, res, r2, valid, X, tc

    h2 = huber_px * huber_px

    def _prior_cost(R, t):
        pw = _rotlog(jnp.einsum("nij,nkj->nik", R, R0))
        pv = t - t0
        return 0.5 * (
            prior_rot * jnp.sum(pw * pw) + prior_t * jnp.sum(pv * pv)
        )

    def _cost_pass(R, t):
        """Robust (Cauchy) data cost — the objective the LM acceptance
        tests. The per-residual weight w = 1/(1 + r2/h2) used in the normal
        equations is exactly the IRLS weight of rho = (h2/2) ln(1 + r2/h2)."""

        def chunk_cost(acc, inp):
            fc, uc, oc = inp
            _, _, _, _, _, r2, valid, _, _ = _track_geometry(R, t, fc, uc, oc)
            return acc + jnp.sum(valid * 0.5 * h2 * jnp.log1p(r2 / h2)), None

        cost, _ = jax.lax.scan(chunk_cost, jnp.asarray(0.0), (fidx, px, okb))
        return cost + _prior_cost(R, t)

    def _hg_pass(R, t):
        """Normal equations (landmarks Schur-eliminated) + robust cost."""

        def chunk_hg(carry, inp):
            H, g, wsum, rsum, cost = carry
            fc, uc, oc = inp  # (chunk, O) ...
            Rc, f, pc, inv_z, res, r2, valid, X, tc = _track_geometry(
                R, t, fc, uc, oc
            )
            zero = jnp.zeros_like(inv_z)
            du = jnp.stack([f * inv_z, zero, -f * pc[..., 0] * inv_z**2], -1)
            dv = jnp.stack([zero, f * inv_z, -f * pc[..., 1] * inv_z**2], -1)
            dpx = jnp.stack([du, dv], -2)  # (c, O, 2, 3)
            rp = pc - tc  # = R X
            Jw = -jnp.einsum("coab,cobd->coad", dpx, _skew(rp))
            Jc = jnp.concatenate([Jw, dpx], -1)  # (c, O, 2, 6) camera Jac
            JX = jnp.einsum("coab,cobd->coad", dpx, Rc)  # (c, O, 2, 3)

            w = valid / (1.0 + r2 / h2)

            # per-track landmark block and its exact elimination. Damping is
            # RELATIVE (LM-style, fraction of the trace): an absolute
            # epsilon leaves near-rank-2 blocks (single low-weight obs,
            # eigenvalues ~{1e5, 1e5, eps}) at condition ~1e9, which
            # overflows the f32 3x3 inverse to inf on real scenes.
            HXX = jnp.einsum("co,cori,corj->cij", w, JX, JX)
            lamX = 1e-3 * jnp.trace(HXX, axis1=-2, axis2=-1) / 3.0 + 1e-6
            HXX = HXX + lamX[:, None, None] * jnp.broadcast_to(jnp.eye(3), HXX.shape)
            S = jnp.linalg.inv(HXX)  # (c, 3, 3)
            W = jnp.einsum("co,cori,corj->coij", w, Jc, JX)  # (c, O, 6, 3)
            gX = jnp.einsum("co,cori,cor->ci", w, JX, res)  # (c, 3)
            WS = jnp.einsum("coij,cjk->coik", W, S)  # (c, O, 6, 3)

            Hd = jnp.einsum("co,cori,corj->coij", w, Jc, Jc)  # diag blocks
            gd = jnp.einsum("co,cori,cor->coi", w, Jc, res) - jnp.einsum(
                "coik,ck->coi", WS, gX
            )
            Hx = -jnp.einsum("coik,cpjk->copij", WS, W)  # (c, O, O, 6, 6)
            # add the per-obs diagonal into the (o, o) slots
            oi = jnp.arange(O)
            Hx = Hx.at[:, oi, oi].add(Hd)

            # scatter: block (o, p) of track -> frame pair (f[o], f[p])
            fi = jnp.repeat(fc[:, :, None], O, axis=2)  # (c, O, O) row frame
            fj = jnp.repeat(fc[:, None, :], O, axis=1)  # (c, O, O) col frame
            H = H.at[fi.reshape(-1), fj.reshape(-1)].add(
                Hx.reshape(-1, 6, 6)
            )
            g = g.at[fc.reshape(-1)].add(gd.reshape(-1, 6))
            wsum = wsum + jnp.sum(w)
            rsum = rsum + jnp.sum(w * r2)
            cost = cost + jnp.sum(valid * 0.5 * h2 * jnp.log1p(r2 / h2))
            return (H, g, wsum, rsum, cost), None

        H0 = jnp.zeros((n, n, 6, 6))
        g0 = jnp.zeros((n, 6))
        zero = jnp.asarray(0.0)
        (H, g, wsum, rsum, cost), _ = jax.lax.scan(
            chunk_hg, (H0, g0, zero, zero, zero), (fidx, px, okb)
        )
        return H, g, wsum, rsum, cost + _prior_cost(R, t)

    def body(state, _):
        # Levenberg-Marquardt with step acceptance: a candidate step is
        # kept only when it lowers the robust objective; rejected steps
        # revert the poses and raise the damping (measured round 4: the
        # previous always-accept GN limit-cycled — 100 iterations ended
        # WORSE than 30 even on perfect synthetic correspondences).
        R, t, lam, _ = state

        H, g, wsum, rsum, cost0 = _hg_pass(R, t)

        # gauge prior toward the initial poses (left-delta from init)
        pw = _rotlog(jnp.einsum("nij,nkj->nik", R, R0))  # R R0^T
        pv = t - t0
        prior = jnp.concatenate(
            [jnp.full((n, 3), prior_rot), jnp.full((n, 3), prior_t)], -1
        )
        di = jnp.arange(n)
        H = H.at[di, di].add(jax.vmap(jnp.diag)(prior))
        g = g + prior * jnp.concatenate([pw, pv], -1)
        H = H.at[0, 0].add(1e6 * jnp.eye(6))  # hard anchor on frame 0

        # Jacobi-preconditioned damped solve: raw diagonal entries span
        # ~[1e2 prior, 1e7 data, 1e6 anchor] — that spread alone exceeds
        # f32 linear-solve conditioning and produced NaNs on real scenes
        Hf = H.transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
        dg = jnp.maximum(jnp.diag(Hf), 1e-6)
        Hf = Hf + lam * jnp.diag(dg)
        Dinv = 1.0 / jnp.sqrt(dg + lam * dg)
        Hs = Hf * Dinv[:, None] * Dinv[None, :]
        gs = g.reshape(6 * n) * Dinv
        delta = -(jnp.linalg.solve(Hs, gs) * Dinv).reshape(n, 6)
        delta = delta.at[0].set(0.0)
        # trust region: one LM step never rotates > ~6 deg or moves a
        # camera more than ~5% of the camera-cloud spread — larger steps
        # are linearization garbage (and the source of f32 NaN blowups)
        centers = -jnp.einsum("nij,ni->nj", R, t)
        spread = jnp.sqrt(
            jnp.sum((centers - jnp.mean(centers, 0)) ** 2, -1).mean()
        )
        t_cap = jnp.maximum(0.05 * 2.0 * spread, 1e-3)
        rot_n = jnp.linalg.norm(delta[:, :3], axis=-1, keepdims=True)
        delta = delta.at[:, :3].mul(jnp.minimum(1.0, 0.1 / jnp.maximum(rot_n, 1e-9)))
        t_n = jnp.linalg.norm(delta[:, 3:], axis=-1, keepdims=True)
        delta = delta.at[:, 3:].mul(jnp.minimum(1.0, t_cap / jnp.maximum(t_n, 1e-9)))
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)

        dR = _exp_so3(delta[:, :3])
        R_cand = jnp.einsum("nij,njk->nik", dR, R)
        t_cand = t + delta[:, 3:]

        cost_cand = _cost_pass(R_cand, t_cand)
        accept = cost_cand < cost0
        R_new = jnp.where(accept, R_cand, R)
        t_new = jnp.where(accept, t_cand, t)
        lam_new = jnp.clip(jnp.where(accept, lam / 3.0, lam * 5.0), 1e-5, 1e3)

        rms = jnp.sqrt(rsum / jnp.maximum(wsum, 1e-9) / 2.0)
        return (R_new, t_new, lam_new, cost0), rms

    (R, t, _, _), rms_hist = jax.lax.scan(
        body, (R0, t0, jnp.asarray(1e-3), jnp.asarray(jnp.inf)), None,
        length=iterations,
    )
    return R, t, {"rms_px": rms_hist, "n_obs": jnp.sum(okb)}


def refine_poses_ba(
    w2c: np.ndarray,  # (ns, 4, 4) current w2c of the graph frames
    focals_canvas: np.ndarray,  # (ns,)
    pp: tuple[float, float],
    pair_idx: np.ndarray,  # (E, 2) graph-local indices
    u_src: np.ndarray,  # (E, P, 2)
    u_tgt: np.ndarray,  # (E, P, 2)
    ok: np.ndarray,  # (E, P)
    iterations: int = 30,
    max_obs: int = 6,
    prior: float = 300.0,
) -> tuple[np.ndarray, dict]:
    """numpy wrapper: pair matches -> tracks -> BA -> corrected w2c.

    `prior` is the gauge/soft-mode se(3) prior weight (pose_ba_core); the
    default 300 is tuned for sub-pixel-refined matches (~0.3 px true error
    measured round 4) — the raw-match default used to be 1e4 because 2 px
    matcher noise needed holding (see pose_ba_core prior_rot note)."""
    trk_f, trk_px, trk_ok = tracks_from_pair_matches(
        pair_idx, u_src, u_tgt, ok, max_obs=max_obs
    )
    if len(trk_f) < 64:
        return w2c, {"skipped": "too_few_tracks"}
    import jax.numpy as jnp_

    R, t, diag = pose_ba_core(
        jnp_.asarray(w2c[:, :3, :3], jnp_.float32),
        jnp_.asarray(w2c[:, :3, 3], jnp_.float32),
        jnp_.asarray(focals_canvas, jnp_.float32),
        jnp_.asarray(pp[0], jnp_.float32),
        jnp_.asarray(pp[1], jnp_.float32),
        jnp_.asarray(trk_f, jnp_.int32),
        jnp_.asarray(trk_px, jnp_.float32),
        jnp_.asarray(trk_ok),
        iterations=iterations,
        prior_rot=prior,
        prior_t=prior,
    )
    out = np.tile(np.eye(4), (len(w2c), 1, 1))
    out[:, :3, :3] = np.asarray(R, np.float64)
    out[:, :3, 3] = np.asarray(t, np.float64)
    rms = np.asarray(diag["rms_px"])
    return out, {
        "rms_px_first": float(rms[0]),
        "rms_px_last": float(rms[-1]),
        "n_tracks": int(len(trk_f)),
        "n_obs": int(diag["n_obs"]),
    }
