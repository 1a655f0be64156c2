"""Multi-chip TriTD-ADMM: mode-1 slab / mode-3 frame sharding with explicit
collectives.

Scaling design (SURVEY §2.5 / north star): the data-sized tensors
(D, O, E, Y_L, Y_O and the mode-1 core A) are sharded along mode-1 slabs on
the mesh's "slab" axis; B, C and every (r^2, r^2) Gram are replicated. Per
ADMM iteration the ONLY cross-chip traffic is:

  * psum of GramA               — r^4 words
  * psum of the mode-2 RHS      — n2 r^2 words
  * psum of the mode-3 RHS      — n3 r^2 words
  * psum of 2 residual scalars

All elementwise sweeps (O, E, duals) and the O(n^3 r^2) GEMMs are local to
the shard. The whole `while_loop` runs INSIDE one shard_map so iterations
never synchronize with the host.

An alternative GSPMD path (`tritd_admm_auto`) jits the single-device solver
with NamedSharding-annotated inputs and lets XLA place the same collectives
automatically — used as a cross-check and for quick experiments.

Zero-padding of n1 to a multiple of the slab count is algebraically inert:
padded rows of D are zero, so their RHS rows — and hence their A rows and
Gram contributions — stay exactly zero through every iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import designs, normal_eq
from ..ops.fold import core_a_from_mat, core_b_from_mat, core_c_from_mat
from ..ops.shrinkage import soft_threshold
from ..solvers.admm import init_factors
from ..solvers.base import TriTDConfig, TriTDResult
from .mesh import pad_to_multiple

AXIS = "slab"


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name)


def _sharded_solver_body_mode3(
    d_loc, a0, b0, c0_loc, cfg: TriTDConfig, axis_name: str
):
    """Mode-3 (frame/time) sharded iteration — the sequence-parallel
    analogue for long video tensors (SURVEY §2.5): D, O, E, Y_L, Y_O are
    sharded along mode 3 together with the C core's frame axis; A, B are
    replicated. Per iteration: psum of GramC (r^4 words) + the mode-1/2 RHS
    partials (n1 r^2 + n2 r^2 words) + residual scalars."""
    dtype = d_loc.dtype
    norm_d = jnp.sqrt(_psum(jnp.sum(d_loc * d_loc), axis_name))
    zeros = jnp.zeros_like(d_loc)
    nan_hist = jnp.full((cfg.max_iter,), jnp.nan, dtype)
    r = cfg.rank
    mu0 = jnp.asarray(cfg.mu, dtype)
    mu_cap = jnp.asarray(cfg.mu * cfg.mu_cap_factor, dtype)

    def cond(carry):
        *_, k, done = carry
        return (k < cfg.max_iter) & ~done

    def body(carry):
        a, b, c, o, e, y_l, y_o, mu_l, mu_o, err_hist, k, done = carry
        t = d_loc - o + y_l / mu_l

        gc = _psum(normal_eq.gram_c(c), axis_name)  # frames sharded -> psum

        # mode-1 (A): K replicated; RHS reduces over the sharded frame axis
        gb = normal_eq.gram_b(b)
        k1 = normal_eq.combine_grams(1, None, gb, gc, cfg.variant)
        rhs1 = _psum(normal_eq.rhs_mode(1, t, a, b, c, cfg.variant), axis_name)
        a = core_a_from_mat(
            normal_eq.ridge_solve(k1, rhs1, cfg.lambda2, cfg.solve_method), r
        )

        # mode-2 (B): same structure
        ga = normal_eq.gram_a(a)
        k2 = normal_eq.combine_grams(2, ga, None, gc, cfg.variant)
        rhs2 = _psum(normal_eq.rhs_mode(2, t, a, b, c, cfg.variant), axis_name)
        b = core_b_from_mat(
            normal_eq.ridge_solve(k2, rhs2, cfg.lambda2, cfg.solve_method), r
        )

        # mode-3 (C): fully local — A, B (hence K3) replicated, RHS rows local
        gb = normal_eq.gram_b(b)
        k3 = normal_eq.combine_grams(3, ga, gb, None, cfg.variant)
        rhs3 = normal_eq.rhs_mode(3, t, a, b, c, cfg.variant)
        c = core_c_from_mat(
            normal_eq.ridge_solve(k3, rhs3, cfg.alpha_c, cfg.solve_method), r
        )

        l = designs.triple_product(a, b, c, variant=cfg.variant)
        r1 = d_loc - l + y_l / mu_l
        r2 = e - y_o / mu_o
        o = (mu_l * r1 + mu_o * r2) / (mu_l + mu_o)
        e = soft_threshold(o + y_o / mu_o, cfg.lambda_l1 / mu_o)
        res_l = d_loc - l - o
        res_o = o - e
        y_l = y_l + mu_l * res_l
        y_o = y_o + mu_o * res_o
        mu_l = jnp.minimum(mu_l * cfg.rho, mu_cap)
        mu_o = jnp.minimum(mu_o * cfg.rho, mu_cap)

        err = (
            jnp.sqrt(_psum(jnp.sum(res_l * res_l), axis_name))
            + jnp.sqrt(_psum(jnp.sum(res_o * res_o), axis_name))
        ) / norm_d
        err_hist = err_hist.at[k].set(err)
        err_prev = err_hist[jnp.maximum(k - 1, 0)]
        done = (k >= 1) & (jnp.abs(err - err_prev) < cfg.tol * err_prev)
        return (a, b, c, o, e, y_l, y_o, mu_l, mu_o, err_hist, k + 1, done)

    carry0 = (
        a0, b0, c0_loc, zeros, zeros, zeros, zeros, mu0, mu0,
        nan_hist, jnp.asarray(0, jnp.int32), jnp.asarray(False),
    )
    a, b, c, o, e, _, _, _, _, err_hist, k, _ = jax.lax.while_loop(
        cond, body, carry0
    )
    return a, b, c, o, e, err_hist, k


def _sharded_solver_body(d_loc, a0_loc, b0, c0, cfg: TriTDConfig, axis_name: str):
    """Runs on each shard under shard_map; d_loc/a-rows are the local slab."""
    dtype = d_loc.dtype
    norm_d = jnp.sqrt(_psum(jnp.sum(d_loc * d_loc), axis_name))
    zeros = jnp.zeros_like(d_loc)
    nan_hist = jnp.full((cfg.max_iter,), jnp.nan, dtype)
    r = cfg.rank
    mu0 = jnp.asarray(cfg.mu, dtype)
    mu_cap = jnp.asarray(cfg.mu * cfg.mu_cap_factor, dtype)

    def cond(carry):
        *_, k, done = carry
        return (k < cfg.max_iter) & ~done

    def body(carry):
        a, b, c, o, e, y_l, y_o, mu_l, mu_o, err_hist, k, done = carry
        t = d_loc - o + y_l / mu_l

        # mode-1 (A) update: fully local — B, C (hence K1) replicated, RHS rows local
        gb = normal_eq.gram_b(b)
        gc = normal_eq.gram_c(c)
        k1 = normal_eq.combine_grams(1, None, gb, gc, cfg.variant)
        rhs1 = normal_eq.rhs_mode(1, t, a, b, c, cfg.variant)
        a = core_a_from_mat(
            normal_eq.ridge_solve(k1, rhs1, cfg.lambda2, cfg.solve_method), r
        )

        # GramA: the one r^4-word collective of the iteration
        ga = _psum(normal_eq.gram_a(a), axis_name)

        # mode-2 (B) update: psum the (n2, r^2) RHS partials
        k2 = normal_eq.combine_grams(2, ga, None, gc, cfg.variant)
        rhs2 = _psum(normal_eq.rhs_mode(2, t, a, b, c, cfg.variant), axis_name)
        b = core_b_from_mat(
            normal_eq.ridge_solve(k2, rhs2, cfg.lambda2, cfg.solve_method), r
        )

        # mode-3 (C) update: psum the (n3, r^2) RHS partials
        gb = normal_eq.gram_b(b)
        k3 = normal_eq.combine_grams(3, ga, gb, None, cfg.variant)
        rhs3 = _psum(normal_eq.rhs_mode(3, t, a, b, c, cfg.variant), axis_name)
        c = core_c_from_mat(
            normal_eq.ridge_solve(k3, rhs3, cfg.alpha_c, cfg.solve_method), r
        )

        # local reconstruction + elementwise ADMM block (no communication)
        l = designs.triple_product(a, b, c, variant=cfg.variant)
        r1 = d_loc - l + y_l / mu_l
        r2 = e - y_o / mu_o
        o = (mu_l * r1 + mu_o * r2) / (mu_l + mu_o)
        e = soft_threshold(o + y_o / mu_o, cfg.lambda_l1 / mu_o)
        res_l = d_loc - l - o
        res_o = o - e
        y_l = y_l + mu_l * res_l
        y_o = y_o + mu_o * res_o
        mu_l = jnp.minimum(mu_l * cfg.rho, mu_cap)
        mu_o = jnp.minimum(mu_o * cfg.rho, mu_cap)

        err = (
            jnp.sqrt(_psum(jnp.sum(res_l * res_l), axis_name))
            + jnp.sqrt(_psum(jnp.sum(res_o * res_o), axis_name))
        ) / norm_d
        err_hist = err_hist.at[k].set(err)
        err_prev = err_hist[jnp.maximum(k - 1, 0)]
        done = (k >= 1) & (jnp.abs(err - err_prev) < cfg.tol * err_prev)
        return (a, b, c, o, e, y_l, y_o, mu_l, mu_o, err_hist, k + 1, done)

    carry0 = (
        a0_loc, b0, c0, zeros, zeros, zeros, zeros, mu0, mu0,
        nan_hist, jnp.asarray(0, jnp.int32), jnp.asarray(False),
    )
    a, b, c, o, e, _, _, _, _, err_hist, k, _ = jax.lax.while_loop(
        cond, body, carry0
    )
    return a, b, c, o, e, err_hist, k


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "axis_name", "shard_tensor_mode", "valid_size"),
)
def _sharded_run(
    d_pad, key, cfg: TriTDConfig, mesh: Mesh, axis_name: str,
    shard_tensor_mode: int = 1, valid_size: int | None = None,
):
    dtype = cfg.jnp_dtype()
    # Draw the factor init at the ORIGINAL (unpadded) shape so the random
    # streams match the single-device solver exactly, then zero-pad the
    # sharded core. Zero padding is inert: padded D entries are zero, so the
    # padded core rows/frames stay exactly zero through every iteration, and
    # C's padded frames must be zero anyway (GramC is psum-reduced before
    # the first C update).
    n1p, n2p, n3p = d_pad.shape
    if valid_size is None:
        orig_shape = (n1p, n2p, n3p)
    elif shard_tensor_mode == 1:
        orig_shape = (valid_size, n2p, n3p)
    else:
        orig_shape = (n1p, n2p, valid_size)
    a0, b0, c0 = init_factors(key, orig_shape, cfg.rank, dtype)
    if shard_tensor_mode == 1 and a0.shape[0] != n1p:
        a0 = jnp.pad(a0, ((0, n1p - a0.shape[0]), (0, 0), (0, 0)))
    if shard_tensor_mode == 3 and c0.shape[2] != n3p:
        c0 = jnp.pad(c0, ((0, 0), (0, 0), (0, n3p - c0.shape[2])))

    if shard_tensor_mode == 1:
        fn = jax.shard_map(
            functools.partial(_sharded_solver_body, cfg=cfg, axis_name=axis_name),
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(), P()),
            out_specs=(
                P(axis_name),  # a (mode-1 rows sharded)
                P(),           # b
                P(),           # c
                P(axis_name),  # o
                P(axis_name),  # e
                P(),           # err_hist
                P(),           # k
            ),
            check_vma=False,
        )
        return fn(d_pad, a0, b0, c0)
    if shard_tensor_mode == 3:
        tensor_spec = P(None, None, axis_name)
        fn = jax.shard_map(
            functools.partial(
                _sharded_solver_body_mode3, cfg=cfg, axis_name=axis_name
            ),
            mesh=mesh,
            in_specs=(tensor_spec, P(), P(), tensor_spec),
            out_specs=(
                P(),           # a
                P(),           # b
                tensor_spec,   # c (frame axis sharded)
                tensor_spec,   # o
                tensor_spec,   # e
                P(),           # err_hist
                P(),           # k
            ),
            check_vma=False,
        )
        return fn(d_pad, a0, b0, c0)
    raise ValueError(f"shard_tensor_mode must be 1 or 3, got {shard_tensor_mode}")


def tritd_admm_sharded(
    d: jnp.ndarray,
    cfg: TriTDConfig,
    mesh: Mesh,
    key: jax.Array | None = None,
    axis_name: str = AXIS,
    shard_tensor_mode: int = 1,
) -> TriTDResult:
    """Sharded robust TriTD-ADMM. shard_tensor_mode=1 shards mode-1 slabs
    (rows i and the A core); shard_tensor_mode=3 shards mode-3 frames (the
    sequence-parallel layout for long video tensors, C core sharded).
    Semantics identical to :func:`tritd_tpu.solvers.tritd_admm` up to float
    reduction order."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n_shards = mesh.shape[axis_name]
    d = d.astype(cfg.jnp_dtype())
    axis = 0 if shard_tensor_mode == 1 else 2
    d_pad, n_orig = pad_to_multiple(d, axis, n_shards)
    spec = (
        P(axis_name, None, None) if shard_tensor_mode == 1
        else P(None, None, axis_name)
    )
    d_pad = jax.device_put(d_pad, NamedSharding(mesh, spec))
    a, b, c, o, e, err_hist, k = _sharded_run(
        d_pad, key, cfg, mesh, axis_name, shard_tensor_mode, n_orig
    )
    if shard_tensor_mode == 1:
        return TriTDResult(
            a=a[:n_orig], b=b, c=c, o=o[:n_orig], e=e[:n_orig],
            err_hist=err_hist, rre_hist=err_hist, n_iters=k,
        )
    return TriTDResult(
        a=a, b=b, c=c[:, :, :n_orig], o=o[..., :n_orig], e=e[..., :n_orig],
        err_hist=err_hist, rre_hist=err_hist, n_iters=k,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "data_axis", "slab_axis"))
def _batch_sharded_run(
    d_batch, key, cfg: TriTDConfig, mesh: Mesh, data_axis: str, slab_axis: str
):
    dtype = cfg.jnp_dtype()
    nb, n1p = d_batch.shape[0], d_batch.shape[1]
    keys = jax.random.split(key, nb)
    a0, b0, c0 = jax.vmap(
        lambda k: init_factors(k, (n1p, *d_batch.shape[2:]), cfg.rank, dtype)
    )(keys)

    body = jax.vmap(
        functools.partial(_sharded_solver_body, cfg=cfg, axis_name=slab_axis)
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(data_axis, slab_axis),
            P(data_axis, slab_axis),
            P(data_axis),
            P(data_axis),
        ),
        out_specs=(
            P(data_axis, slab_axis),  # a
            P(data_axis),             # b
            P(data_axis),             # c
            P(data_axis, slab_axis),  # o
            P(data_axis, slab_axis),  # e
            P(data_axis),             # err_hist
            P(data_axis),             # k
        ),
        check_vma=False,
    )
    return fn(d_batch, a0, b0, c0)


def tritd_admm_batch_sharded(
    d_batch: jnp.ndarray,
    cfg: TriTDConfig,
    mesh: Mesh,
    key: jax.Array | None = None,
    data_axis: str = "data",
    slab_axis: str = AXIS,
) -> TriTDResult:
    """Data-parallel batch of independent TriTD problems (e.g. the four CDnet
    sequences, BASELINE.json config 5) with each problem's mode-1 slabs
    sharded across the "slab" axis — DP x TP on a 2-D mesh. Batch entries run
    their own early-stop via the vmapped while_loop."""
    if key is None:
        key = jax.random.PRNGKey(0)
    d_batch = d_batch.astype(cfg.jnp_dtype())
    n_data = mesh.shape[data_axis]
    n_slab = mesh.shape[slab_axis]
    if d_batch.shape[0] % n_data:
        raise ValueError(
            f"batch {d_batch.shape[0]} not divisible by data axis {n_data}"
        )
    d_pad, n1 = pad_to_multiple(d_batch, 1, n_slab)
    d_pad = jax.device_put(
        d_pad, NamedSharding(mesh, P(data_axis, slab_axis, None, None))
    )
    a, b, c, o, e, err_hist, k = _batch_sharded_run(
        d_pad, key, cfg, mesh, data_axis, slab_axis
    )
    return TriTDResult(
        a=a[:, :n1], b=b, c=c, o=o[:, :n1], e=e[:, :n1],
        err_hist=err_hist, rre_hist=err_hist, n_iters=k,
    )


def tritd_admm_auto(
    d: jnp.ndarray,
    cfg: TriTDConfig,
    mesh: Mesh,
    key: jax.Array | None = None,
    axis_name: str = AXIS,
):
    """GSPMD alternative: annotate the input sharding and let XLA's SPMD
    partitioner place the collectives in the single-device solver."""
    from ..solvers.admm import tritd_admm

    n_shards = mesh.shape[axis_name]
    d = d.astype(cfg.jnp_dtype())
    d_pad, n1 = pad_to_multiple(d, 0, n_shards)
    d_pad = jax.device_put(d_pad, NamedSharding(mesh, P(axis_name, None, None)))
    res = tritd_admm(d_pad, cfg, key=key)
    return TriTDResult(
        a=res.a[:n1], b=res.b, c=res.c, o=res.o[:n1], e=res.e[:n1],
        err_hist=res.err_hist, rre_hist=res.rre_hist, n_iters=res.n_iters,
    )
