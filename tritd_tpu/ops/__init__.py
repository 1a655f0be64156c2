"""Tensor-ops kernel layer (L0 of SURVEY §1): folds, TriTD designs,
Kronecker-free normal equations, shrinkage/proximal operators, SVT."""

from .fold import (
    unfold,
    fold,
    core_a_mat,
    core_a_from_mat,
    core_b_mat,
    core_b_from_mat,
    core_c_mat,
    core_c_from_mat,
)
from .designs import (
    VARIANTS,
    build_f,
    build_g,
    build_h,
    triple_product,
    triple_product_naive,
    kron_f,
)
from .normal_eq import (
    gram_a,
    gram_b,
    gram_c,
    gram_mode,
    combine_grams,
    rhs_mode,
    gram_and_rhs,
    ridge_solve,
    SOLVE_METHODS,
)
from .shrinkage import (
    soft_threshold,
    weighted_soft_threshold,
    lp_reweight,
    prox_l1,
    huber_clip,
    biweight,
)
from .svt import svt, svt_ref_compat
from .prox import capped_simplex_projection, flsa
from .pallas_kernels import elementwise_block
from .kruskal import khatrirao, ktensor_full, tenmat, tenrand, cp_normalize, create_problem

__all__ = [
    "unfold",
    "fold",
    "core_a_mat",
    "core_a_from_mat",
    "core_b_mat",
    "core_b_from_mat",
    "core_c_mat",
    "core_c_from_mat",
    "VARIANTS",
    "build_f",
    "build_g",
    "build_h",
    "triple_product",
    "triple_product_naive",
    "kron_f",
    "gram_a",
    "gram_b",
    "gram_c",
    "gram_mode",
    "combine_grams",
    "rhs_mode",
    "gram_and_rhs",
    "ridge_solve",
    "SOLVE_METHODS",
    "soft_threshold",
    "weighted_soft_threshold",
    "lp_reweight",
    "prox_l1",
    "huber_clip",
    "biweight",
    "svt",
    "svt_ref_compat",
    "capped_simplex_projection",
    "flsa",
    "elementwise_block",
    "khatrirao",
    "ktensor_full",
    "tenmat",
    "tenrand",
    "cp_normalize",
    "create_problem",
]
