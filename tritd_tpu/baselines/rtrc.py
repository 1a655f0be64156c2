"""RTRC — robust tensor-ring completion by ADMM ("RING"/TRLRF in the
reference's figures, `foreground_grid.m:66-67`).

Reference: `other_methods/tensor-ring/RTRC.m:1-83` with `shrink_matrix.m`
(flag=false -> plain SVT branch, which is what both drivers use),
`shrink_vector.m`, and the `evaluate_fr_R.m` freedom-ratio heuristic that
sets the per-cut weights from numerical ranks of the circular unfoldings.

Setup (host side): L = ceil(N/2) circular-shift unfoldings; lambda
auto-set from the sampling ratio (`RTRC.m:17-23`); weights 1/Em normalized
(`RTRC.m:33-35`). Loop (jit'd, fixed 100 iterations — the reference's
convergence break is commented out `RTRC.m:70-72`): SVT each circular
unfolding, masked data-fidelity x-update, l1 sparse part on observed
entries, dual ascent, mu*1.1 capped at 1e6.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.shrinkage import soft_threshold
from ..ops.svt import run_warm_blocks, svt, svt_warm, warm_spec, warm_unroll


def _circular_orders(n: int):
    l = -(-n // 2)
    return [tuple((np.arange(n) + shift) % n) for shift in range(l)]


#: content-hash -> (FR, Em) cache. The numerical ranks are a pure function
#: of (x_obs, p_mask); np.linalg.matrix_rank of the big circular unfoldings
#: is 10-40 s of HOST f64 SVD at the chicago/video shapes — by far the
#: dominant cost of repeated rtrc solves of the same problem (bench warm-up
#: + reps, parity re-runs). Caching preserves EXACT numpy f64 rank
#: semantics (a device-side f32 rank would count near-tolerance singular
#: values differently and drift the weight trajectory vs the reference
#: emulator). Callers that want the raw cost pass use_cache=False; the
#: bench records the first-call cost as rank_setup_seconds.
_FREEDOM_RATIO_CACHE: dict = {}


def _fingerprint(x_obs, p_mask) -> tuple:
    """Cheap content fingerprint of (x_obs, p_mask) for the rank cache.

    Hashing the full arrays would defeat the cache's purpose on TPU: it
    forces a full device->host fetch (~47 MB through the axon tunnel takes
    seconds) per call. Instead: sha1 of a strided device subsample
    (<= ~64k elements, a small fetch) + the Frobenius norm + the observed
    count. A false hit needs two different problems agreeing on all three
    — not a realistic risk for cache reuse across repeated solves of the
    same benchmark problem, which is the only pattern this serves."""
    import hashlib

    x = jnp.asarray(x_obs)
    p = jnp.asarray(p_mask)
    strides = tuple(max(1, s // 40) for s in x.shape)
    sl = tuple(slice(None, None, st) for st in strides)
    sample = np.asarray(x[sl], np.float32)
    h = hashlib.sha1(sample.tobytes())
    norm = float(jnp.linalg.norm(x.ravel()))
    nobs = float(jnp.sum(p.astype(jnp.float32)))
    return (x.shape, h.hexdigest(), round(norm, 4), nobs)


def freedom_ratio(x_obs: np.ndarray, p_mask: np.ndarray, use_cache: bool = True):
    """(FR, Em) per `evaluate_fr_R.m`: numerical rank of each circular
    unfolding of the observed tensor drives the weights and epsilon."""
    key = None
    if use_cache:
        key = _fingerprint(x_obs, p_mask)
        hit = _FREEDOM_RATIO_CACHE.get(key)
        if hit is not None:
            return hit
    x_obs = np.asarray(x_obs)
    p_mask = np.asarray(p_mask)
    n = x_obs.ndim
    shape = x_obs.shape
    m = p_mask.sum()
    l = -(-n // 2)
    df_m, em = [], []
    for order in _circular_orders(n):
        mat = np.transpose(x_obs, order).reshape(
            math.prod([shape[o] for o in order[:l]]), -1
        )
        rank = np.linalg.matrix_rank(mat)
        big = max(mat.shape)
        df_m.append(rank * (sum(mat.shape) - rank) / m)
        em.append(big * rank * math.log(big) ** 2.5)
    out = (float(np.mean(df_m)), np.asarray(em, np.float64))
    if key is not None:
        if len(_FREEDOM_RATIO_CACHE) > 16:
            _FREEDOM_RATIO_CACHE.clear()
        _FREEDOM_RATIO_CACHE[key] = out
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "mu0", "lam", "weights", "max_iter", "has_origin", "orders", "svt_method"
    ),
)
def _rtrc_run(
    x_obs, p, origin, mu0, lam, weights, orders, max_iter, has_origin,
    svt_method="svd",
):
    shape = x_obs.shape
    l = len(orders)
    dtype = x_obs.dtype
    zeros = jnp.zeros(shape, dtype)
    norm_origin = jnp.linalg.norm(origin.ravel()) if has_origin else 1.0
    inv_orders = [tuple(np.argsort(o)) for o in orders]
    dims_l = [math.prod([shape[o] for o in order[: -(-len(shape) // 2)]]) for order in orders]
    total = math.prod(shape)
    warm = svt_method.startswith("warm")
    if warm:
        # "warm:<K>": warm-started basis reuse on the big-thin-side circular
        # unfoldings (chicago's 5929x2016 cut pays a ~160 ms eigh per
        # iteration on the exact path). RTRC uses PLAIN soft-threshold SVT
        # (no truncation gate), for which warm reuse is valid — it
        # approximates the basis, not the retained rank (ops/svt.py::
        # svt_warm; validated by tools/validate_warm_svt.py --method ring).
        warm_period, warm_idx, warm_thin = warm_spec(
            svt_method, [(d, total // d) for d in dims_l]
        )

    def body(i, carry, refresh=True):
        x, y, w, ls, zs, bases, err_hist = carry
        mu = jnp.minimum(mu0 * 1.1**i, 1e6)
        # SVT each circular-shift unfolding (`RTRC.m:45-54`)
        ls_new = []
        bases_new = list(bases)
        for n_ in range(l):
            m = jnp.transpose(x - zs[n_] / mu, orders[n_]).reshape(dims_l[n_], -1)
            if warm and n_ in warm_idx:
                wi = warm_idx.index(n_)
                m, bases_new[wi] = svt_warm(
                    m, weights[n_] / mu, bases[wi], refresh
                )
            else:
                m = svt(m, weights[n_] / mu,
                        method="gram" if warm else svt_method)
            shp = tuple(shape[o] for o in orders[n_])
            ls_new.append(jnp.transpose(m.reshape(shp), inv_orders[n_]))
        l_cs = sum(ls_new)
        z_cs = sum(zs)
        # x update: masked data fidelity (`:56-58`)
        x = (l_cs + z_cs / mu + p * (x_obs - y - w / mu)) / (l + p)
        # y update: sparse part on observed entries (`:60`)
        y = soft_threshold(p * (x_obs - x - w / mu), lam / mu)
        # duals (`:62-66`)
        zs_new = tuple(zs[n_] + mu * (ls_new[n_] - x) for n_ in range(l))
        w = w + mu * p * (x + y - x_obs)
        if has_origin:
            err_hist = err_hist.at[i].set(
                jnp.linalg.norm((x - origin).ravel()) / norm_origin
            )
        return (x, y, w, tuple(ls_new), zs_new, tuple(bases_new), err_hist)

    bases0 = (
        tuple(jnp.eye(t, dtype=dtype) for t in warm_thin) if warm else ()
    )
    carry0 = (
        x_obs, zeros, zeros,
        tuple(x_obs for _ in range(l)), tuple(zeros for _ in range(l)), bases0,
        jnp.full((max_iter,), jnp.nan, dtype),
    )
    if warm:
        out = run_warm_blocks(
            body, carry0, 0, max_iter, warm_period,
            unroll=warm_unroll([(d, total // d) for d in dims_l]),
        )
    else:
        out = jax.lax.fori_loop(0, max_iter, body, carry0)
    x, y, _, _, _, _, err_hist = out
    return x, y, err_hist


def precompute_freedom_ratio(tnsr: jnp.ndarray, p_mask: jnp.ndarray):
    """Populate the freedom-ratio cache with EXACTLY the arrays a
    subsequent :func:`rtrc` call will fingerprint (same dtype conversions),
    and return (FR, Em). Lets callers pay/report the host-SVD rank cost
    once, separately from the device solve."""
    tnsr = jnp.asarray(tnsr)
    p_dev = jnp.asarray(p_mask).astype(tnsr.dtype)
    return freedom_ratio(tnsr * p_dev, p_dev)


def rtrc(
    tnsr: jnp.ndarray,
    p_mask: jnp.ndarray,
    mu: float = 1e-1,
    origin: jnp.ndarray | None = None,
    max_iter: int = 100,
    svt_method: str = "svd",
):
    """Returns (x low-rank, y sparse, errHist, n_iters).

    p_mask is the OBSERVED indicator (True = observed), like RTRC's P.
    Driver presets: mu=1e-1 traffic (`traffic_triple_comparison.m:139`),
    mu=1e-3 video with P all-true (`video_triple_comparison.m:156`)."""
    n = tnsr.ndim
    l = -(-n // 2)
    shape = tnsr.shape
    # Stay on device: the old host conversions round-tripped ~150 MB
    # through the axon tunnel per call (np mask cast + full x_obs fetch for
    # the rank hash) and dominated the chicago/video ring rows. Only the
    # fingerprint's small sample + two scalars are fetched on a cache hit.
    tnsr = jnp.asarray(tnsr)
    p_dev = jnp.asarray(p_mask).astype(tnsr.dtype)
    x_obs = tnsr * p_dev

    sr = float(jnp.sum(p_dev)) / p_dev.size
    lam = 0.0
    for order in _circular_orders(n):
        dim_l = math.prod([shape[o] for o in order[:l]])
        dim_r = math.prod([shape[o] for o in order[l:]])
        lam += 500.0 / math.sqrt(sr * max(dim_l, dim_r))

    _, em = freedom_ratio(x_obs, p_dev)
    weight = (1.0 / em) / (1.0 / em).sum()

    has_origin = origin is not None
    dummy = origin if has_origin else x_obs
    orders = tuple(tuple(int(v) for v in o) for o in _circular_orders(n))
    x, y, err_hist = _rtrc_run(
        x_obs, p_dev, dummy,
        float(mu), float(lam), tuple(float(w) for w in weight),
        orders, max_iter, has_origin, svt_method,
    )
    return x, y, err_hist, max_iter
