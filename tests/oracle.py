"""Independent NumPy oracle for the full MPPI update.

Pattern copied *in spirit* from the reference's de-facto correctness check:
scripts/plot_csv.py:77-109 recomputes cost, β, exp, η, weights and the updated
action sequence in NumPy from dumped data. Here the oracle implements the
governing equations (reference src/cost.cu:42-64, src/point_mass_gpu.cu:82-121,
src/point_mass.cu:273-480, 805-824) directly, in float64, with naive loops —
deliberately nothing shared with the JAX implementation.
"""

from __future__ import annotations

import numpy as np


def oracle_lti_step(x: np.ndarray, u_eff: np.ndarray, dt: float) -> np.ndarray:
    """Double integrator: q' = q + dt qd + dt²/2 u;  qd' = qd + dt u."""
    a = u_eff.shape[-1]
    x = np.asarray(x, np.float64)
    q, qd = x[..., :a], x[..., a:]
    return np.concatenate(
        [q + dt * qd + 0.5 * dt * dt * u_eff, qd + dt * u_eff], axis=-1
    )


def oracle_rollout_costs(
    x0: np.ndarray,    # (s,)
    U: np.ndarray,     # (T, a)
    eps: np.ndarray,   # (T, K, a)
    dt: float,
    w: np.ndarray,     # (s,)
    goal: np.ndarray,  # (s,)
    lam: float,
    inv_s: np.ndarray, # (a,)
) -> np.ndarray:
    T, K, a = eps.shape
    S = np.zeros(K, np.float64)
    x = np.tile(np.asarray(x0, np.float64), (K, 1))
    for t in range(T):
        u_eff = U[t][None, :] + eps[t]
        x = oracle_lti_step(x, u_eff, dt)
        # step cost on x_{t+1}: λ·Σ u·Σ⁻¹·ε + (x−g)ᵀdiag(w)(x−g)
        S += lam * (U[t][None, :] * inv_s[None, :] * eps[t]).sum(-1)
        S += ((x - goal[None, :]) ** 2 * w[None, :]).sum(-1)
    # terminal cost (the reference double-counts x_T's state cost — so do we)
    S += ((x - goal[None, :]) ** 2 * w[None, :]).sum(-1)
    return S


def oracle_softmin_update(
    S: np.ndarray,     # (K,)
    eps: np.ndarray,   # (T, K, a)
    U: np.ndarray,     # (T, a)
    lam: float,
    max_a: np.ndarray | None = None,
):
    """Returns (U_new, action, U_shifted, weights, beta, eta)."""
    beta = S.min()
    e = np.exp(-(S - beta) / lam)
    eta = e.sum()
    wgt = e / eta
    U_new = U.astype(np.float64).copy()
    T = U.shape[0]
    for t in range(T):
        U_new[t] = U_new[t] + (wgt[:, None] * eps[t]).sum(0)
    if max_a is not None:
        U_new = np.clip(U_new, -np.asarray(max_a), np.asarray(max_a))
    action = U_new[0].copy()
    U_shift = np.concatenate([U_new[1:], U_new[-1:]], axis=0)
    return U_new, action, U_shift, wgt, beta, eta


def oracle_solve(
    x0, U, eps, dt, w, goal, lam, inv_s, max_a=None
):
    """Full MPPI solve in NumPy. Mirrors mppi_gpu_tpu.controller.mppi_solve
    (deterministic mode)."""
    S = oracle_rollout_costs(x0, U, eps, dt, w, goal, lam, inv_s)
    return S, *oracle_softmin_update(S, eps, U, lam, max_a)
