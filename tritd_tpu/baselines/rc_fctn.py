"""RC-FCTN — robust tensor completion via the Fully-Connected Tensor
Network nuclear-norm surrogate, by ADMM.

Reference: `other_methods/IPI_RTC_FCTN-main/RTC_FCTN/RC_FCTN.m:1-117`:
SVT over all C(N, N/2)/2 balanced mode bipartitions (`myorder` `:119-136`,
`weightFCTN` `:138-150` with max(IL, IR) weights), l1 sparse part,
closed-form joint (X, E), observed-entry projection of Y (`:92`), 1.5x
penalty growth, RSE_real oracle history. The SVT carries the reference's
`r = sum(S > 1)` truncation quirk (`lib/SVT.m:8`).

Driver wrappers reproduce the two protocols:
  * traffic (`traffic_triple_comparison.m:149-173`): 3-way -> 4-way reshape
    [I, J, K/sub, sub], Ind = all-ones (the driver's `Ind(~mask)=1` on a
    ones array marks EVERYTHING observed — a quirk kept for parity),
    lambda = 5000/sqrt(max(I,J)*n3*n4), f=0.1, gamma=deta=1e-3.
  * video (`video_triple_comparison.m:240-262`): [I, J, sub, K/sub],
    Ind = observed indicator, lambda=1.8, f=0.7.
"""

from __future__ import annotations

import functools
import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.shrinkage import prox_l1
from ..ops.svt import (
    run_warm_blocks,
    svt_ref_compat,
    svt_ref_compat_warm,
    warm_spec,
    warm_unroll,
)


def _bipartition_shapes(nway, dims_l):
    total = math.prod(nway)
    return [(d, total // d) for d in dims_l]


#: Validated randomized-SVT rank budget for the video bipartition shapes
#: (4800x4800, 3600x6400 at subdim 20): err_hist within 3.9e-5 of the exact
#: path over 50 iterations (tools/validate_lowrank_svt.py,
#: docs/BENCH_NOTES.md), and its budget^2 eigh is 3x cheaper than the 1024
#: default's.
VIDEO_SVT_BUDGET = 512


def resolve_video_svt_method(svt_method: str) -> str:
    """Resolve the video driver's SVT route: a bare "auto" gets the
    shape-validated budget (see VIDEO_SVT_BUDGET); every explicit request —
    "svd", "gram", "auto:<b>", "lowrank:<b>" — passes through untouched
    (r3 advisor: an explicit 'gram' must actually run the Gram path, and
    recorded metadata must name the route that ran)."""
    return f"auto:{VIDEO_SVT_BUDGET}" if svt_method == "auto" else svt_method


def balanced_bipartitions(n: int):
    """`myorder(N)`: orders [combo, complement] over the unique balanced
    bipartitions (combos containing mode 0, lexicographic)."""
    half = n // 2
    orders = []
    for combo in itertools.combinations(range(n), half):
        if combo[0] != 0:
            continue
        rest = tuple(i for i in range(n) if i not in combo)
        orders.append(combo + rest)
    return orders


def weight_fctn(nway: tuple[int, ...], orders) -> list[float]:
    """`weightFCTN`: alpha_k = max(prod(first half), prod(second half)),
    normalized."""
    half = len(nway) // 2
    lam = []
    for order in orders:
        il = math.prod(nway[o] for o in order[:half])
        ir = math.prod(nway[o] for o in order[half:])
        lam.append(max(il, ir))
    total = sum(lam)
    return [v / total for v in lam]


@functools.partial(
    jax.jit,
    static_argnames=(
        "lam", "f", "gamma0", "deta0", "max_iter", "n_steps", "has_origin",
        "svt_method", "warm_cfg",
    ),
)
def _rc_fctn_steps(
    x_noise, ind_obs, origin, carry, k0, lam, f, gamma0, deta0, max_iter,
    n_steps, has_origin, svt_method="svd", warm_cfg=None,
):
    """Run `n_steps` iterations from absolute iteration `k0` (traced, so one
    compilation serves every chunk). Chunking bounds the wall time of a
    single dispatch: at the video 4-way shape the bipartition SVTs include a
    4800x4800 eigh, and a 100-iteration fori_loop in ONE dispatch ran >10
    min and crashed the TPU worker (measured, round 3); chunked dispatches
    avoid the watchdog at a cost of ~26 ms RTT per chunk."""
    nway = x_noise.shape
    n = len(nway)
    half = n // 2
    orders = balanced_bipartitions(n)
    inv_orders = [tuple(int(v) for v in np.argsort(o)) for o in orders]
    alpha = weight_fctn(nway, orders)
    mu = [f * a for a in alpha]
    sum_mu = sum(mu)
    dims_l = [math.prod(nway[o] for o in order[:half]) for order in orders]

    dtype = x_noise.dtype
    ind_mis = 1.0 - ind_obs
    norm_origin = jnp.linalg.norm(origin.ravel()) if has_origin else 1.0
    # warm_cfg is the (period, indices, thin_sides) spec computed ONCE in
    # rc_fctn() — the same object that sized the carried bases, so index/
    # shape alignment cannot drift between the two (r4 review).
    warm = warm_cfg is not None
    if warm:
        warm_period, warm_idx, _ = warm_cfg

    def body(k, carry, refresh=True):
        """One iteration. `refresh` is a PYTHON bool in warm mode — the
        refresh schedule is compile-time static (block-unrolled below), not
        a lax.cond: measured on TPU (r4), a traced `k % K == 0` cond around
        the big eigh executed BOTH branches for some K (warm:4 ran slower
        than exact gram), so the branch must be resolved at trace time."""
        x, y, e, s, p, q, zs, bases, err_hist = carry
        gamma = gamma0 * 1.5**k
        deta = deta0 * 1.5**k
        # L_n: SVT over each balanced bipartition (`RC_FCTN.m:68-75`)
        ls = []
        bases_new = list(bases)
        for i, order in enumerate(orders):
            mat = jnp.transpose(x - zs[i] / mu[i], order).reshape(dims_l[i], -1)
            if warm and i in warm_idx:
                j = warm_idx.index(i)
                mat, bases_new[j] = svt_ref_compat_warm(
                    mat, alpha[i] / mu[i], bases[j], refresh
                )
            else:
                mat = svt_ref_compat(
                    mat, alpha[i] / mu[i],
                    method="gram" if warm else svt_method,
                )
            shp = tuple(nway[o] for o in order)
            ls.append(jnp.transpose(mat.reshape(shp), inv_orders[i]))
        # S (`:78`)
        s = prox_l1(e - q / deta, lam / deta)
        # joint (X, E) (`:81-89`)
        temp = sum(mu[i] * (ls[i] + zs[i] / mu[i]) for i in range(len(orders)))
        m_ = temp + gamma * (y + p / gamma)
        n_ = gamma * (y + p / gamma) + deta * (s + q / deta)
        tt = gamma**2 - (sum_mu + gamma) * (gamma + deta)
        x = (gamma * n_ - (gamma + deta) * m_) / tt
        e = (gamma * m_ - (sum_mu + gamma) * n_) / tt
        # observed-entry projection (`:92`)
        y = ind_mis * (x + e - p / gamma) + ind_obs * x_noise
        # duals (`:95-99`)
        zs = tuple(zs[i] + mu[i] * (ls[i] - x) for i in range(len(orders)))
        p = p + gamma * (y - x - e)
        q = q + deta * (s - e)
        if has_origin:
            err_hist = err_hist.at[k].set(
                jnp.linalg.norm((x + s - origin).ravel()) / norm_origin
            )
        return (x, y, e, s, p, q, zs, tuple(bases_new), err_hist)

    if not warm:
        return jax.lax.fori_loop(k0, k0 + n_steps, body, carry)

    # Warm mode: statically-scheduled refresh blocks (ops/svt.py::
    # run_warm_blocks — constant program size, eigh only in the refresh
    # body). Chunk boundaries start a new block, so refreshes happen at
    # least every K iterations (never less often).
    return run_warm_blocks(
        body, carry, k0, n_steps, warm_period,
        unroll=warm_unroll(_bipartition_shapes(nway, dims_l)),
    )


def rc_fctn(
    x_noise: jnp.ndarray,
    lam: float,
    ind_obs: jnp.ndarray,
    origin: jnp.ndarray | None = None,
    f: float = 0.1,
    gamma: float = 1e-3,
    deta: float = 1e-3,
    max_iter: int = 100,
    svt_method: str = "svd",
    chunk: int | None = None,
):
    """Returns (X low-rank, S sparse, errHist RSE_real). ind_obs is the
    observed indicator (1 = keep data constraint). `chunk` caps iterations
    per device dispatch (None = all in one dispatch); see _rc_fctn_steps.

    svt_method additionally accepts ``"warm:<K>"``: exact Gram-eigh SVT
    refreshed every K-th iteration, warm-started basis reuse in between,
    on bipartitions with thin side >= ops/svt.py WARM_MIN_DIM (others run
    exact gram every iteration) — the traffic-protocol analog of the video
    route's randomized SVT, for shapes where the retained spectrum is NOT
    low-rank (chicago's 5929x2016 keeps >=76%). Validated against the
    exact path by tools/validate_warm_svt.py."""
    has_origin = origin is not None
    dummy = origin if has_origin else x_noise
    ind = ind_obs.astype(x_noise.dtype)
    chunk = max_iter if chunk is None else min(chunk, max_iter)
    zeros = jnp.zeros(x_noise.shape, x_noise.dtype)
    orders = balanced_bipartitions(x_noise.ndim)
    bases, warm_cfg = (), None
    if svt_method.startswith("warm"):
        half = x_noise.ndim // 2
        dims_l = [
            math.prod(x_noise.shape[o] for o in order[:half]) for order in orders
        ]
        warm_cfg = warm_spec(
            svt_method, _bipartition_shapes(x_noise.shape, dims_l)
        )
        # Identity placeholders; the first block iteration refreshes before
        # any reuse (run_warm_blocks). Sized by the SAME spec object the
        # step function consumes.
        bases = tuple(jnp.eye(t, dtype=x_noise.dtype) for t in warm_cfg[2])
    carry = (
        zeros, x_noise, zeros, zeros, zeros, zeros,
        tuple(zeros for _ in orders),
        bases,
        jnp.full((max_iter,), jnp.nan, x_noise.dtype),
    )
    k0 = 0
    while k0 < max_iter:
        n_steps = min(chunk, max_iter - k0)
        carry = _rc_fctn_steps(
            x_noise, ind, dummy, carry, jnp.asarray(k0, jnp.int32),
            float(lam), float(f), float(gamma), float(deta), max_iter,
            n_steps, has_origin, svt_method, warm_cfg,
        )
        k0 += n_steps
    x, _, _, s, _, _, _, _, err_hist = carry
    return x, s, err_hist


def _split_mode3(x: jnp.ndarray, n3: int, n4: int) -> jnp.ndarray:
    """MATLAB column-major `reshape(X, [I J n3 n4])` of an (I, J, n3*n4)
    tensor: the third index is the FAST one within the original mode-3 axis.
    Row-major equivalent: split as (n4, n3) then swap."""
    i, j, _ = x.shape
    return x.reshape(i, j, n4, n3).transpose(0, 1, 3, 2)


def _merge_mode3(x4: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_split_mode3`."""
    i, j, n3, n4 = x4.shape
    return x4.transpose(0, 1, 3, 2).reshape(i, j, n3 * n4)


def rc_fctn_driver_traffic(
    y: jnp.ndarray,
    mask_obs: jnp.ndarray,
    subdim: int,
    origin: jnp.ndarray | None = None,
    max_iter: int = 100,
    svt_method: str = "svd",
):
    """Traffic-driver wrapper (`traffic_triple_comparison.m:149-173`):
    4-way reshape [I, J, K/sub, sub] (column-major semantics)."""
    i, j, k = y.shape
    n3, n4 = k // subdim, subdim
    y4 = _split_mode3(y, n3, n4)
    origin4 = _split_mode3(origin, n3, n4) if origin is not None else None
    lam = 5000.0 / math.sqrt(max(i, j) * n3 * n4)
    ind = jnp.ones(y4.shape, y.dtype)  # driver quirk: everything marked observed
    # warm route: chunk=25 matches the validated configuration
    # (tools/validate_warm_svt.py / docs/WARM_SVT_r04.json) and keeps the
    # block-unrolled program a compile-helper-friendly size.
    x4, s4, err_hist = rc_fctn(
        y4, lam, ind, origin=origin4, f=0.1, max_iter=max_iter,
        svt_method=svt_method,
        chunk=25 if svt_method.startswith("warm") else None,
    )
    return _merge_mode3(x4), _merge_mode3(s4), err_hist


def rc_fctn_driver_video(
    y: jnp.ndarray,
    mask_obs: jnp.ndarray,
    subdim: int,
    origin: jnp.ndarray | None = None,
    max_iter: int = 100,
    svt_method: str = "auto",
):
    """Video-driver wrapper (`video_triple_comparison.m:240-262`):
    4-way reshape [I, J, sub, K/sub] (column-major semantics).

    Default svt_method="auto": the video bipartitions are square-ish
    (4800x4800, 3600x6400 at subdim 20), where even the Gram trick leaves a
    ~1 s eigh per bipartition per iteration on a v5e — ~200 s per solve vs
    the reference's published 50.64 s. "auto" routes those (and only those —
    thin-side >= ops/svt.py LOWRANK_MIN_DIM) to the randomized top-k SVT at
    the validated VIDEO_SVT_BUDGET. Every explicit request, including
    "gram", runs exactly the route it names (resolve_video_svt_method)."""
    i, j, k = y.shape
    n3, n4 = subdim, k // subdim
    y4 = _split_mode3(y, n3, n4)
    origin4 = _split_mode3(origin, n3, n4) if origin is not None else None
    ind = _split_mode3(mask_obs.astype(y.dtype), n3, n4)
    svt_method = resolve_video_svt_method(svt_method)
    # chunk=25: bounds a single device dispatch well under the TPU worker
    # watchdog (one 100-iteration dispatch crashed the worker, round 3);
    # see _rc_fctn_steps docstring.
    x4, s4, err_hist = rc_fctn(
        y4, 1.8, ind, origin=origin4, f=0.7, max_iter=max_iter,
        svt_method=svt_method, chunk=25,
    )
    return _merge_mode3(x4), _merge_mode3(s4), err_hist
