"""Reference-protocol oracle emulators (test-only, never a compute path).

Independent float64 numpy re-derivations of the reference solvers under
MATLAB column-major semantics (order='F' reshapes, pinv solves, the exact
reference control flow). They exist to convert "semantics parity" from
code-reading claims into measured full-trajectory evidence: the parity
driver (tools/emulator_parity.py) runs each JAX solver and its emulator on
identical data/inits and compares whole err_hist trajectories
(docs/EMULATOR_PARITY_r05.json); tests/test_emulator_parity.py pins the
same comparison at tiny shapes.
"""

from .matlab_emulator import (
    rc_fctn_em,
    rtrc_em,
    sofia_init_em,
    tritd_admm_em,
    tt_trpca_em,
)

__all__ = [
    "tritd_admm_em",
    "tt_trpca_em",
    "rtrc_em",
    "rc_fctn_em",
    "sofia_init_em",
]
