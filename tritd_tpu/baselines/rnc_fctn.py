"""RNC-FCTN — robust tensor completion by PAM on explicit FCTN factors.

Reference: `other_methods/IPI_RTC_FCTN-main/RTC_FCTN/RNC_FCTN.m:1-117` with
the FCTN composition helpers `tnprod/tnprod_rest/tensor_contraction/
tnreshape` (vendored in the reference, exercised by `Demo_RNC_FCTN.m`; the
benchmark drivers call the nuclear-norm sister `RC_FCTN` instead — this
module completes the inventory).

For a 4-way tensor the FCTN factors are four 4-way cores sharing pairwise
rank bonds r_ij (rank matrix R upper-triangular):

    G1[n1, r12, r13, r14]   G2[r12, n2, r23, r24]
    G3[r13, r23, n3, r34]   G4[r14, r24, r34, n4]
    X[a,b,c,d] = einsum('aqrs,qbtu,rtcv,suvd->abcd', G1, G2, G3, G4)

The MATLAB index-juggling contraction helpers collapse to single einsums
here. Per PAM iteration (`RNC_FCTN.m:56-95`): proximal ridge LS on each
factor against the composition of the others, proximal X / soft-threshold E
/ observed-projection Y updates, beta *= rh, and adaptive FCTN-rank growth
(pad factors with a random scalar when the relative change stalls,
`rank_inc_adaptive` `:99-104`). Rank growth changes shapes, so the driver is
a host loop around a jit'd fixed-shape step (a handful of retraces at most).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.shrinkage import soft_threshold

_SPEC = "aqrs,qbtu,rtcv,suvd->abcd"
_REST_SPECS = {
    0: "qbtu,rtcv,suvd->qrsbcd",  # free: bond dims (q,r,s) + spatial (b,c,d)
    1: "aqrs,rtcv,suvd->qtuacd",
    2: "aqrs,qbtu,suvd->rtvabd",
    3: "aqrs,qbtu,rtcv->suvabc",
}
# factor i's own axes order: spatial axis position within the factor
_SPATIAL_AXIS = (0, 1, 2, 3)


def fctn_compose(gs) -> jnp.ndarray:
    """`tnprod(G)` for N=4 — the FCTN composition."""
    return jnp.einsum(_SPEC, *gs, optimize="optimal")


def _factor_matrices(gs, i):
    """(G_i unfolded (n_i, prod bonds), rest matrix (prod bonds, prod other
    spatial)) matching `my_Unfold` + `tnreshape(tnprod_rest)` semantics."""
    others = [g for j, g in enumerate(gs) if j != i]
    rest = jnp.einsum(_REST_SPECS[i], *others, optimize="optimal")
    bond_dims = rest.shape[:3]
    rest_mat = rest.reshape(int(np.prod(bond_dims)), -1)
    gi = gs[i]
    spatial_ax = i  # G_i's spatial axis is its i-th axis
    gi_mat = jnp.moveaxis(gi, spatial_ax, 0).reshape(gi.shape[spatial_ax], -1)
    return gi_mat, rest_mat, bond_dims, spatial_ax


def _update_factor(x, gs, rho, i):
    gi_mat, rest_mat, bond_dims, spatial_ax = _factor_matrices(gs, i)
    n = x.shape[i]
    x_mat = jnp.moveaxis(x, i, 0).reshape(n, -1)
    temp_c = x_mat @ rest_mat.T + rho * gi_mat
    temp_a = rest_mat @ rest_mat.T + rho * jnp.eye(rest_mat.shape[0], dtype=x.dtype)
    gi_new_mat = temp_c @ jnp.linalg.pinv(temp_a)
    gi_new = jnp.moveaxis(
        gi_new_mat.reshape((n, *bond_dims)), 0, spatial_ax
    )
    return gi_new


@jax.jit
def _pam_step(f, omega, x, e, y, gs, lam, rho, beta):
    for i in range(4):
        gs = tuple(
            _update_factor(x, gs, rho, i) if j == i else gs[j]
            for j in range(4)
        )
    x_old = x
    x = (fctn_compose(gs) + rho * x_old + beta * (y - e)) / (1.0 + rho + beta)
    e = soft_threshold(
        (beta * (y - x) + rho * e) / (beta + rho), lam / (beta + rho)
    )
    y = (beta * (x + e) + rho * y) / (beta + rho)
    y = jnp.where(omega, f, y)
    rse = jnp.linalg.norm((x - x_old).ravel()) / (
        jnp.linalg.norm(x_old.ravel()) + 1e-30
    )
    return x, e, y, gs, rse


def _init_factors(key, nway, rank: np.ndarray, dtype):
    """G_i ~ U[0,1) of shape tempdim(i,:) = diag(Nway) + R + R'."""
    r = np.asarray(rank)
    tempdim = np.diag(nway) + r + r.T
    gs = []
    for i in range(4):
        key, sub = jax.random.split(key)
        gs.append(jax.random.uniform(sub, tuple(int(v) for v in tempdim[i]), dtype))
    return tuple(gs), tempdim


def _griddata_frames(vol: np.ndarray, mask: np.ndarray, fill: float) -> np.ndarray:
    """`lib/interpolate.m:1-18`: per-frame scattered LINEAR interpolation of
    the observed entries onto the full grid, NaN (outside the convex hull)
    filled with `fill`. The reference's meshgrid/permute transposes cancel;
    this is the direct equivalent on (row, col) coordinates."""
    from scipy.interpolate import griddata

    n1, n2, n3 = vol.shape
    gx, gy = np.mgrid[0:n1, 0:n2]
    out = np.empty_like(vol, dtype=np.float64)
    for t in range(n3):
        m = mask[:, :, t] > 0
        if int(m.sum()) < 3:  # griddata needs a non-degenerate triangulation
            out[:, :, t] = fill
            continue
        pts = np.argwhere(m).astype(np.float64)
        interp = griddata(pts, vol[:, :, t][m], (gx, gy), method="linear")
        np.nan_to_num(interp, copy=False, nan=fill)
        out[:, :, t] = interp
    return out


def interpolate_init(
    f: jnp.ndarray,
    omega: jnp.ndarray,
    pad: int = 20,
    fill: float = 128.0,
    clip: tuple[float, float] = (0.0, 1.0),
) -> jnp.ndarray:
    """RNC-FCTN's interpolation warm start for `sample_ratio < 1`
    (`Demo_RNC_FCTN.m:37-55`, VERDICT r4 #9): symmetric-pad the 3-way view
    by `pad`, linearly interpolate the observed entries in TWO shifted
    plane orientations ((d2, d3) planes per d1 slice and (d3, d1) planes
    per d2 slice), clip each to `clip`, restore observed entries, and
    average 0.5/0.5. The result replaces the zero-filled data tensor as
    RNC_FCTN's input (`:90` passes X1 as F). At sample_ratio 1 this is the
    identity on observed data.

    The `fill=128` on [0, 1]-scaled data is the reference's committed quirk
    (`interpolate.m:17`); it is clipped to `clip[1]` immediately, so the
    effective out-of-hull fill is the upper clip bound. Host-side numpy/
    scipy: this is one-time init preprocessing, not a solve-loop path."""
    f_np = np.asarray(f, np.float64)
    om_np = np.asarray(omega, bool)
    nway = f_np.shape
    n1, n2 = nway[0], nway[1]
    a3 = f_np.reshape(n1, n2, -1)
    ind3 = om_np.reshape(n1, n2, -1).astype(np.float64)
    obs = om_np.reshape(n1, n2, -1)
    b = np.pad(a3, pad, mode="symmetric")
    c = np.pad(ind3, pad, mode="symmetric")
    lo, hi = clip
    sl = slice(pad, -pad)

    # a1: interpolate (d2, d3) planes across d1 (`shiftdim(B,1)`)
    r1 = _griddata_frames(b.transpose(1, 2, 0), c.transpose(1, 2, 0), fill)
    r1 = np.clip(r1, lo, hi)[sl, sl, sl].transpose(2, 0, 1)
    r1[obs] = a3[obs]
    # a2: interpolate (d3, d1) planes across d2 (`shiftdim(B,2)`)
    r2 = _griddata_frames(b.transpose(2, 0, 1), c.transpose(2, 0, 1), fill)
    r2 = np.clip(r2, lo, hi)[sl, sl, sl].transpose(1, 2, 0)
    r2[obs] = a3[obs]

    a = 0.5 * r1 + 0.5 * r2
    return jnp.asarray(a.reshape(nway), jnp.asarray(f).dtype)


def rnc_fctn(
    f: jnp.ndarray,
    lam: float,
    omega: jnp.ndarray,
    rank: np.ndarray | None = None,
    max_rank: np.ndarray | None = None,
    rho: float = 0.1,
    beta: float = 1.0,
    rh: float = 1.0,
    tol: float = 1e-6,
    max_iter: int = 100,
    origin: jnp.ndarray | None = None,
    key: jax.Array | None = None,
):
    """PAM robust FCTN completion of a 4-way tensor. omega True = observed.

    Returns (X, gs, E, rse_real_hist, n_iters). rank/max_rank are 4x4
    upper-triangular FCTN-rank matrices (defaults: all-2 growing to all-3)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    nway = f.shape
    assert len(nway) == 4, "RNC-FCTN is defined for 4-way tensors"
    if rank is None:
        rank = np.triu(np.full((4, 4), 2), 1)
    if max_rank is None:
        max_rank = np.triu(np.full((4, 4), 3), 1)
    rank = np.asarray(rank)
    max_rank = np.asarray(max_rank)

    dtype = f.dtype
    gs, tempdim = _init_factors(key, nway, rank, dtype)
    max_tempdim = np.diag(nway) + max_rank + max_rank.T
    x = f
    e = jnp.zeros(nway, dtype)
    y = f
    omega = jnp.asarray(omega, bool)
    r_change = 0.01
    hist = []
    norm_xt = (
        float(jnp.linalg.norm(jnp.asarray(origin).ravel()))
        if origin is not None
        else 1.0
    )
    k = 0
    for k in range(1, max_iter + 1):
        x, e, y, gs, rse = _pam_step(
            f, omega, x, e, y, gs,
            jnp.asarray(lam, dtype), jnp.asarray(rho, dtype), jnp.asarray(beta, dtype),
        )
        rse = float(rse)
        if origin is not None:
            hist.append(
                float(jnp.linalg.norm((jnp.asarray(origin) - x - e).ravel()))
                / norm_xt
            )
        if k > 10 and rse < tol:
            break
        # adaptive rank growth (`RNC_FCTN.m:88-93`): pad every growable bond
        rank_inc = (tempdim < max_tempdim).astype(int)
        if rse < r_change and rank_inc.sum() > 0:
            key, sub = jax.random.split(key)
            pad_val = float(jax.random.uniform(sub, ()))
            new_gs = []
            for i in range(4):
                pads = [(0, int(rank_inc[i, j])) for j in range(4)]
                new_gs.append(
                    jnp.pad(gs[i], pads, constant_values=pad_val)
                )
            gs = tuple(new_gs)
            tempdim = tempdim + rank_inc
            r_change *= 0.5
        beta = rh * beta
    return x, gs, e, np.asarray(hist), k
