"""Batched 3x3 SVD for TPU with a degenerate-safe custom VJP.

TPU has no fast native SVD primitive, so the forward pass is a one-sided
Jacobi eigendecomposition of ``A^T A`` — a handful of fused element-wise
sweeps that vectorize on the VPU across the particle batch, with no
per-matrix control flow. This replaces the LAPACK-style
``jnp.linalg.svd`` the reference calls on GPU
(reference: DaXBench/daxbench/core/engine/svd_safe_batch.py:19-51).

The backward pass implements the standard complex-safe SVD adjoint with
``x -> x / (x^2 + eps)`` regularized inverses so gradients stay finite when
singular values collide or vanish (same math as
svd_safe_batch.py:54-102, re-derived; see e.g. Wan & Zhang,
"Automatic differentiation of SVD", and the jax.linalg notes).

All functions operate on arrays of shape ``(..., 3, 3)``.
"""

from functools import partial

import jax
import jax.numpy as jnp

DEFAULT_EPS = 1e-12
_JACOBI_SWEEPS = 6  # full sweeps of the 3 off-diagonal rotations


def _jacobi_rotation(app, aqq, apq):
    """Stable Givens rotation (c, s) that annihilates ``apq``."""
    # tau = (aqq - app) / (2 apq); t = sign(tau)/(|tau| + sqrt(1+tau^2))
    safe_apq = jnp.where(jnp.abs(apq) < 1e-30, 1.0, apq)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.abs(apq) < 1e-30, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    return c, s


def _givens(c, s, p, q, dtype):
    """Batched Givens matrix G: identity with G[p,p]=G[q,q]=c, G[p,q]=s,
    G[q,p]=-s. Built by stacking (no in-place scatter updates — those blow up
    both compile time and runtime when the SVD sits inside a physics scan)."""
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    entries = {(i, i): one for i in range(3)}
    entries[(p, p)] = c
    entries[(q, q)] = c
    entries[(p, q)] = s
    entries[(q, p)] = -s
    rows = [
        jnp.stack([entries.get((i, j), zero) for j in range(3)], axis=-1)
        for i in range(3)
    ]
    return jnp.stack(rows, axis=-2)


def _apply_jacobi(S, V, p, q):
    """One (p, q) Jacobi rotation: S <- G^T S G, V <- V G (batched matmuls)."""
    c, s = _jacobi_rotation(S[..., p, p], S[..., q, q], S[..., p, q])
    G = _givens(c, s, p, q, S.dtype)
    Gt = jnp.swapaxes(G, -1, -2)
    S = Gt @ S @ G
    V = V @ G
    return S, V


def _eigh3(M):
    """Eigendecomposition of a batch of symmetric 3x3 matrices by cyclic Jacobi.

    Returns (w, V) with ``M ~= V diag(w) V^T``; eigenvalues unsorted.
    """
    S = M
    V = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape)
    for _ in range(_JACOBI_SWEEPS):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            S, V = _apply_jacobi(S, V, p, q)
    w = jnp.diagonal(S, axis1=-2, axis2=-1)
    return w, V


def _sort_desc(sig, V):
    order = jnp.argsort(-sig, axis=-1)
    sig = jnp.take_along_axis(sig, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return sig, V


def svd3_jacobi(A):
    """Forward 3x3 SVD: ``A == (U * S[..., None, :]) @ Vh``.

    S is non-negative, sorted descending. U, Vh orthogonal (U may contain a
    reflection when A has negative determinant, matching LAPACK convention
    where S stays non-negative).
    """
    ATA = jnp.einsum("...ji,...jk->...ik", A, A)
    w, V = _eigh3(ATA)
    w = jnp.maximum(w, 0.0)
    sig = jnp.sqrt(w)
    sig, V = _sort_desc(sig, V)

    # U = A V / sig, regularized for tiny singular values, then re-orthonormalized
    # by a Gram-Schmidt pass so degenerate columns stay orthogonal.
    AV = jnp.einsum("...ij,...jk->...ik", A, V)
    safe = sig / (sig * sig + 1e-30)
    U = AV * safe[..., None, :]

    # Modified Gram-Schmidt on the 3 columns with deterministic fallbacks.
    def _normalize(col, fallback):
        n = jnp.linalg.norm(col, axis=-1, keepdims=True)
        ok = n > 1e-6
        col = jnp.where(ok, col / jnp.where(ok, n, 1.0), fallback)
        return col

    e0 = jnp.zeros_like(U[..., 0]).at[..., 0].set(1.0)
    u0 = _normalize(U[..., :, 0], e0)
    u1 = U[..., :, 1] - jnp.sum(U[..., :, 1] * u0, -1, keepdims=True) * u0
    # fallback for u1: any vector orthogonal to u0
    alt = jnp.cross(u0, jnp.roll(u0, 1, axis=-1) + e0 * 0.5)
    altn = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), 1e-12)
    u1 = _normalize(u1, altn)
    u2 = jnp.cross(u0, u1)
    # keep the sign consistent with A V when sigma_2 is meaningful
    sgn = jnp.sign(jnp.sum(u2 * AV[..., :, 2], -1, keepdims=True))
    sgn = jnp.where(jnp.abs(sgn) < 0.5, 1.0, sgn)
    u2 = u2 * sgn
    U = jnp.stack([u0, u1, u2], axis=-1)
    Vh = jnp.swapaxes(V, -1, -2)
    return U, sig, Vh


def _safe_inverse(x, eps):
    return x / (x * x + eps)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def svd3(A, epsilon=DEFAULT_EPS):
    """3x3 batched SVD with a degenerate-safe VJP (drop-in for the hot path)."""
    return svd3_jacobi(A)


def _svd3_fwd(A, epsilon):
    U, S, Vh = svd3_jacobi(A)
    return (U, S, Vh), (U, S, Vh)


def _svd3_bwd(epsilon, res, g):
    dU, dS, dVh = g
    U, S, Vh = res

    Ut = jnp.swapaxes(U, -1, -2)
    Vt = jnp.swapaxes(Vh, -1, -2)  # = V
    Vt_dV = jnp.einsum("...ij,...kj->...ik", Vh, dVh)  # V^T dV

    S2 = S * S
    S_inv = _safe_inverse(S, epsilon)

    I = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), U.shape)
    F = _safe_inverse(S2[..., None, :] - S2[..., :, None], epsilon)
    F = F - I * F  # zero diagonal

    J = F * jnp.einsum("...ij,...jk->...ik", Ut, dU)
    K = F * Vt_dV
    L = I * Vt_dV

    JT = jnp.swapaxes(J, -1, -2)
    KT = jnp.swapaxes(K, -1, -2)
    LT = jnp.swapaxes(L, -1, -2)

    P_U_perp = I - U @ Ut
    P_V_perp = I - Vt @ Vh

    Sr = S[..., None, :]
    dSr = dS[..., None, :]
    S_invr = S_inv[..., None, :]

    dA = (
        (U * dSr) @ Vh
        + U @ ((J + JT) * Sr) @ Vh
        + (U * Sr) @ (K + KT) @ Vh
        + 0.5 * ((U * S_invr) @ (L - LT) @ Vh)
        + P_U_perp @ (dU * S_invr) @ Vh
        + (U * S_invr) @ dVh @ P_V_perp
    )
    return (dA,)


svd3.defvjp(_svd3_fwd, _svd3_bwd)
