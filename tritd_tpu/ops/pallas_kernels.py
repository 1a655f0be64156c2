"""Pallas TPU kernel: the fused elementwise ADMM block.

Each TriTD-ADMM iteration ends with five O(n1*n2*n3) elementwise sweeps plus
two Frobenius-norm reductions (`triple_decomp_ADMM.m:41-59`):

    r1 = D - L + Y_L/muL            o  = (muL*r1 + muO*r2)/(muL+muO)
    r2 = E - Y_O/muO                e  = soft(o + Y_O/muO, lam/muO)
    res_l = D - L - o               Y_L += muL*res_l
    res_o = o - e                   Y_O += muO*res_o
    ||res_l||^2, ||res_o||^2

XLA fuses the pointwise chain but materializes intermediates around the two
reductions; this kernel does the whole block in ONE pass over HBM: 5 tensor
reads, 4 tensor writes, and the two scalar accumulators ride along in SMEM-
adjacent (1,1) outputs. The grid walks (row, col) tiles sequentially per
core, so cross-tile accumulation into the scalar outputs is safe.

`elementwise_block(..., use_pallas=False)` is the jnp reference
implementation — the unit tests check the kernel against it exactly
(interpret mode on CPU).

MEASURED (v5e-1, 240x320x300 f32, 50-deep dependency chain, host-fetch
synced): XLA's own fusion of the jnp path reaches ~646 GB/s effective
(~80% of HBM peak) — the elementwise block is NOT a fusion win for Pallas
on current XLA, whose reduction+pointwise fusion already saturates HBM.
The kernel is kept as an optional path (and as the template for future
fusions where XLA does leave bandwidth on the table); the solver default is
use_pallas=False accordingly. The serialized (1,1) SMEM accumulator is the
current structural cost: per-tile partial outputs are not yet expressible
(Mosaic requires (8,128)-aligned or whole-array blocks)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .shrinkage import soft_threshold

_TILE_ROWS = 256
_TILE_COLS = 512


def _block_jnp(d, l, e, y_l, y_o, mu_l, mu_o, lam,
               compute_dtype=None, store_dtype=None):
    if compute_dtype is not None:
        # narrow-storage mode: HBM loads are half-width, the convert fuses
        # into the load; all arithmetic (incl. the norm accumulators) runs
        # in the wide dtype in registers.
        d, l, e, y_l, y_o = (x.astype(compute_dtype) for x in (d, l, e, y_l, y_o))
    r1 = d - l + y_l / mu_l
    r2 = e - y_o / mu_o
    o = (mu_l * r1 + mu_o * r2) / (mu_l + mu_o)
    e_new = soft_threshold(o + y_o / mu_o, lam / mu_o)
    res_l = d - l - o
    res_o = o - e_new
    y_l_new = y_l + mu_l * res_l
    y_o_new = y_o + mu_o * res_o
    nl = jnp.sum(res_l * res_l)
    no = jnp.sum(res_o * res_o)
    if store_dtype is not None:
        o, e_new, y_l_new, y_o_new = (
            x.astype(store_dtype) for x in (o, e_new, y_l_new, y_o_new)
        )
    return o, e_new, y_l_new, y_o_new, nl, no


def _kernel(scal_ref, d_ref, l_ref, e_ref, yl_ref, yo_ref,
            o_out, e_out, yl_out, yo_out, nl_out, no_out):
    """Per-tile body; the two norm accumulators live in (1, 1) SMEM outputs
    shared across the sequential grid walk (initialized at step 0)."""
    from jax.experimental import pallas as pl

    mu_l = scal_ref[0]
    mu_o = scal_ref[1]
    lam = scal_ref[2]

    @pl.when(pl.program_id(0) == 0)
    def _():
        nl_out[0, 0] = jnp.zeros((), nl_out.dtype)
        no_out[0, 0] = jnp.zeros((), no_out.dtype)

    d = d_ref[:]
    l = l_ref[:]
    e = e_ref[:]
    y_l = yl_ref[:]
    y_o = yo_ref[:]

    r1 = d - l + y_l / mu_l
    r2 = e - y_o / mu_o
    o = (mu_l * r1 + mu_o * r2) / (mu_l + mu_o)
    shifted = o + y_o / mu_o
    thr = lam / mu_o
    e_new = jnp.sign(shifted) * jnp.maximum(jnp.abs(shifted) - thr, 0.0)
    res_l = d - l - o
    res_o = o - e_new

    o_out[:] = o
    e_out[:] = e_new
    yl_out[:] = y_l + mu_l * res_l
    yo_out[:] = y_o + mu_o * res_o
    nl_out[0, 0] += jnp.sum(res_l * res_l)
    no_out[0, 0] += jnp.sum(res_o * res_o)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _block_pallas(d, l, e, y_l, y_o, scalars, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = d.shape
    total = d.size
    cols = _TILE_COLS
    rows_total = -(-total // cols)
    rows_pad = -(-rows_total // _TILE_ROWS) * _TILE_ROWS
    pad = rows_pad * cols - total

    def flat(x):
        # zero padding is inert: every derived quantity at a padded entry is 0
        return jnp.pad(x.ravel(), (0, pad)).reshape(rows_pad, cols)

    n_tiles = rows_pad // _TILE_ROWS
    grid = (n_tiles,)
    tile = pl.BlockSpec(
        (_TILE_ROWS, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    scal_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scalar_out = pl.BlockSpec(
        (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
    )

    outs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[scal_spec, tile, tile, tile, tile, tile],
        out_specs=(tile, tile, tile, tile, scalar_out, scalar_out),
        out_shape=(
            jax.ShapeDtypeStruct((rows_pad, cols), d.dtype),
            jax.ShapeDtypeStruct((rows_pad, cols), d.dtype),
            jax.ShapeDtypeStruct((rows_pad, cols), d.dtype),
            jax.ShapeDtypeStruct((rows_pad, cols), d.dtype),
            jax.ShapeDtypeStruct((1, 1), d.dtype),
            jax.ShapeDtypeStruct((1, 1), d.dtype),
        ),
        interpret=interpret,
    )(scalars, flat(d), flat(l), flat(e), flat(y_l), flat(y_o))

    o, e_new, y_l_new, y_o_new, nl, no = outs

    def unflat(x):
        return x.ravel()[:total].reshape(shape)

    return (
        unflat(o), unflat(e_new), unflat(y_l_new), unflat(y_o_new),
        nl[0, 0], no[0, 0],
    )


def elementwise_block(
    d, l, e, y_l, y_o, mu_l, mu_o, lam, use_pallas: bool = False,
    interpret: bool = False, compute_dtype=None, store_dtype=None,
):
    """Fused O/E/dual/residual update. Returns
    (o, e_new, y_l_new, y_o_new, ||res_l||^2, ||res_o||^2).

    compute_dtype/store_dtype support the solver's narrow-storage mode
    (cfg.storage_dtype): inputs upcast on load, the four tensor outputs
    downcast on store, norms stay in compute_dtype. The Pallas path does
    not implement the mixed-dtype variant — callers route narrow-storage
    runs through the XLA fusion (which handles it at full bandwidth)."""
    if not use_pallas:
        return _block_jnp(
            d, l, e, y_l, y_o, mu_l, mu_o, lam,
            compute_dtype=compute_dtype, store_dtype=store_dtype,
        )
    if compute_dtype is not None or store_dtype is not None:
        raise NotImplementedError(
            "narrow-storage elementwise block is XLA-only (use_pallas=False)"
        )
    scalars = jnp.stack(
        [jnp.asarray(mu_l, d.dtype), jnp.asarray(mu_o, d.dtype),
         jnp.asarray(lam, d.dtype)]
    )
    return _block_pallas(d, l, e, y_l, y_o, scalars, interpret=interpret)
