"""Generate golden convention fixtures from a MATLAB-semantics emulator.

The reference's layout claims live in column-major MATLAB code
(`fast_robust_triple_tensor/unfold.m:1-14`, `buildF.m:17-22`,
`triple_decomp_ADMM.m:31-66,111-130`). This script re-derives those
semantics independently in numpy using order='F' reshapes (numpy's exact
model of MATLAB column-major `reshape`/`permute`), evaluates them on tiny
deterministic integer tensors, and prints Python literals that are pasted
verbatim into tests/test_golden.py.

The emulator is a semantic model, not a port: it exists only to pin the
repo's row-major conventions to the reference's column-major ones, so any
future drift in fold.py / designs.py / normal_eq.py fails a literal check
(SURVEY §7 risk (a)).

Run:  python tools/gen_golden.py
"""

from __future__ import annotations

import numpy as np

np.set_printoptions(precision=17, floatmode="maxprec")


# --- MATLAB column-major primitives ----------------------------------------


def m_reshape(x, shape):
    return np.reshape(x, shape, order="F")


def m_permute(x, order):
    return np.transpose(x, [o - 1 for o in order])


def m_unfold(x, mode):
    """unfold.m:1-14 under column-major semantics."""
    n1, n2, n3 = x.shape
    if mode == 1:
        return m_reshape(x, (n1, n2 * n3))
    if mode == 2:
        return m_reshape(m_permute(x, (2, 1, 3)), (n2, n1 * n3))
    if mode == 3:
        return m_reshape(m_permute(x, (3, 1, 2)), (n3, n1 * n2))
    raise ValueError(mode)


def m_buildF(b, c):
    """buildF.m:17-22: F(q+(s-1)r, j+(t-1)n2) = B(q,j,s) C(q,s,t)."""
    r, n2, _ = b.shape
    n3 = c.shape[2]
    bu = m_reshape(m_unfold(b, 2), (n2, r * r, 1))
    cu = m_reshape(m_unfold(c, 3).T, (1, r * r, n3))
    f = bu * cu
    f = m_reshape(f, (n2, r, r, n3))
    return m_reshape(m_permute(f, (2, 3, 1, 4)), (r * r, n2 * n3))


def m_buildG(a, c):
    """buildG.m:17-22: G(p+(s-1)r, i+(t-1)n1) = A(i,p,s) C(p,s,t)."""
    n1, r, _ = a.shape
    n3 = c.shape[2]
    au = m_reshape(m_unfold(a, 1), (n1, r * r, 1))
    cu = m_reshape(m_unfold(c, 3).T, (1, r * r, n3))
    g = au * cu
    g = m_reshape(g, (n1, r, r, n3))
    return m_reshape(m_permute(g, (2, 3, 1, 4)), (r * r, n1 * n3))


def m_buildH(a, b):
    """buildH.m:17-22: H(p+(q-1)r, i+(j-1)n1) = A(i,p,q) B(p,j,q)."""
    n1, r, _ = a.shape
    n2 = b.shape[1]
    au = m_reshape(m_unfold(a, 1), (n1, r * r, 1))
    bu = m_reshape(m_unfold(b, 2).T, (1, r * r, n2))
    h = au * bu
    h = m_reshape(h, (n1, r, r, n2))
    return m_reshape(m_permute(h, (2, 3, 1, 4)), (r * r, n1 * n2))


def m_triple_product(a, b, c):
    """triple_product.m:6-7."""
    n1 = a.shape[0]
    n2, n3 = b.shape[1], c.shape[2]
    xh = m_unfold(a, 1) @ m_buildF(b, c)
    return m_reshape(xh, (n1, n2, n3))


def m_reshape_A_from_A1(a1, n1, r):
    a = np.zeros((n1, r, r))
    for i in range(n1):
        a[i, :, :] = m_reshape(a1[i, :], (r, r))
    return a


def m_reshape_B_from_B2(b2, n2, r):
    b = np.zeros((r, n2, r))
    for j in range(n2):
        b[:, j, :] = m_reshape(b2[j, :], (r, r))
    return b


def m_reshape_C_from_C3(c3, n3, r):
    c = np.zeros((r, r, n3))
    for t in range(n3):
        c[:, :, t] = m_reshape(c3[t, :], (r, r))
    return c


def m_admm_iterations(d, a, b, c, n_iter, mu=0.5, rho=1.25, lam=0.3,
                      lam2=1e-3):
    """triple_decomp_ADMM.m:31-66, pinv solves, from a given init."""
    r = a.shape[1]
    n1, n2, n3 = d.shape
    mu_l = mu_o = mu
    cap = mu * 1e6
    o = np.zeros_like(d)
    e = np.zeros_like(d)
    y_l = np.zeros_like(d)
    y_o = np.zeros_like(d)
    norm_d = np.linalg.norm(d)
    errs = []
    for _ in range(n_iter):
        t = d - o + y_l / mu_l
        f = m_buildF(b, c)
        a1 = (m_unfold(t, 1) @ f.T) @ np.linalg.pinv(
            f @ f.T + lam2 * np.eye(r * r)
        )
        a = m_reshape_A_from_A1(a1, n1, r)
        g = m_buildG(a, c)
        b2 = (m_unfold(t, 2) @ g.T) @ np.linalg.pinv(
            g @ g.T + lam2 * np.eye(r * r)
        )
        b = m_reshape_B_from_B2(b2, n2, r)
        h = m_buildH(a, b)
        c3 = (m_unfold(t, 3) @ h.T) @ np.linalg.pinv(
            h @ h.T + 1e-9 * np.eye(r * r)
        )
        c = m_reshape_C_from_C3(c3, n3, r)
        l = m_triple_product(a, b, c)
        r1 = d - l + y_l / mu_l
        r2 = e - y_o / mu_o
        o = (mu_l * r1 + mu_o * r2) / (mu_l + mu_o)
        r3 = o + y_o / mu_o
        e = np.sign(r3) * np.maximum(np.abs(r3) - lam / mu_o, 0.0)
        res_l = d - l - o
        res_o = o - e
        y_l = y_l + mu_l * res_l
        y_o = y_o + mu_o * res_o
        mu_l = min(mu_l * rho, cap)
        mu_o = min(mu_o * rho, cap)
        errs.append(
            np.linalg.norm(res_l) / norm_d + np.linalg.norm(res_o) / norm_d
        )
    return l, o, e, errs


def lit(x):
    return np.array2string(
        np.asarray(x), separator=", ", threshold=10**6, max_line_width=78
    )


def main():
    # Fixture tensors: deterministic integers, no randomness.
    x = np.zeros((2, 3, 2))
    for i in range(2):
        for j in range(3):
            for t in range(2):
                x[i, j, t] = 100 * i + 10 * j + t
    print("# unfold golden (X[i,j,t] = 100i + 10j + t, shape (2,3,2))")
    for mode in (1, 2, 3):
        print(f"UNFOLD_{mode} = np.array({lit(m_unfold(x, mode))})")

    r, n1, n2, n3 = 2, 2, 2, 2
    a = np.zeros((n1, r, r))
    b = np.zeros((r, n2, r))
    c = np.zeros((r, r, n3))
    for i in range(n1):
        for p in range(r):
            for q in range(r):
                a[i, p, q] = 1 + i + 2 * p + 3 * q
    for q in range(r):
        for j in range(n2):
            for s in range(r):
                b[q, j, s] = 1 + 2 * q + j + 4 * s
    for q in range(r):
        for s in range(r):
            for t in range(n3):
                c[q, s, t] = 1 + 3 * q + s + 2 * t
    print("\n# design-matrix golden (A[i,p,q]=1+i+2p+3q, B[q,j,s]=1+2q+j+4s,")
    print("# C[q,s,t]=1+3q+s+2t; r=2, n1=n2=n3=2)")
    print(f"BUILD_F = np.array({lit(m_buildF(b, c))})")
    print(f"BUILD_G = np.array({lit(m_buildG(a, c))})")
    print(f"BUILD_H = np.array({lit(m_buildH(a, b))})")
    print(f"TRIPLE_PRODUCT = np.array({lit(m_triple_product(a, b, c))})")

    # The ADMM fixture must NOT be exactly representable at r=2 (a 2x2x2
    # tensor is, leaving only float noise to compare) — use 3x3x3 with a
    # non-multilinear term so residuals stay O(1).
    d = np.zeros((3, 3, 3))
    for i in range(3):
        for j in range(3):
            for t in range(3):
                d[i, j, t] = ((-1) ** (i + j + t)) * (
                    1 + i + 2 * j + 3 * t
                ) + i * j * t
    a0 = np.zeros((3, r, r))
    b0 = np.zeros((r, 3, r))
    c0 = np.zeros((r, r, 3))
    for i in range(3):
        for p in range(r):
            for q in range(r):
                a0[i, p, q] = (1 + i + 2 * p + 3 * q) / 4.0
    for q in range(r):
        for j in range(3):
            for s in range(r):
                b0[q, j, s] = (1 + 2 * q + j + 4 * s) / 4.0
    for q in range(r):
        for s in range(r):
            for t in range(3):
                c0[q, s, t] = (1 + 3 * q + s + 2 * t) / 4.0
    l, o, e, errs = m_admm_iterations(d, a0, b0, c0, n_iter=2)
    print("\n# two ADMM iterations golden (3x3x3, r=2,")
    print("# D[i,j,t]=(-1)^(i+j+t)(1+i+2j+3t)+ijt, init as in test_golden.py;")
    print("# mu=.5 rho=1.25 lambda=.3 lambda2=1e-3)")
    print(f"ADMM_L = np.array({lit(l)})")
    print(f"ADMM_O = np.array({lit(o)})")
    print(f"ADMM_E = np.array({lit(e)})")
    print(f"ADMM_ERRS = np.array({lit(np.asarray(errs))})")


if __name__ == "__main__":
    main()
