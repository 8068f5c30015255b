"""SPH smoothing kernels and derivatives, 2D and 3D normalizations.

Reference parity: upstream USER-SPH hard-codes the Lucy kernel inside each
pair style (e.g. ``src/USER-SPH/pair_sph_taitwater.cpp`` — see SURVEY.md
§2.2); the multiphase fork's examples additionally use quintic-spline and
Wendland kernels (SURVEY.md §2.3). Here kernels are first-class functions so
every pair op shares them.

Conventions
-----------
All kernels are parameterized by ``cut`` — the FULL support radius, matching
the ``h`` argument of LAMMPS ``pair_coeff`` (in USER-SPH the coefficient named
``h`` IS the cutoff). Two functions per kernel:

  w(r, cut, dim)    -> W(r)          the kernel value, 0 for r >= cut
  wfd(r, cut, dim)  -> (1/r) dW/dr   the "force divided" derivative used by
                                     every pair style: grad_i W = wfd * (x_i - x_j)

``wfd`` is finite as r -> 0 for all kernels here, and both functions return 0
outside the support. ``dim`` is a static Python int (2 or 3).
"""

from __future__ import annotations

import math
from functools import partial

import jax.numpy as jnp

# Kernel ids (static ints so they can live in hashable flag tuples).
LUCY = 0
CUBIC_SPLINE = 1
QUINTIC_SPLINE = 2
WENDLAND_C2 = 3

KERNEL_NAMES = {
    "lucy": LUCY,
    "cubic": CUBIC_SPLINE,
    "cubicspline": CUBIC_SPLINE,
    "quintic": QUINTIC_SPLINE,
    "quinticspline": QUINTIC_SPLINE,
    "wendland": WENDLAND_C2,
    "wendland/c2": WENDLAND_C2,
}


def _safe_q(r, cut):
    """r/cut clamped to [0, 1] support; keeps grads finite."""
    return jnp.clip(r / cut, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Lucy (1977): W = sigma (1 + 3q)(1 - q)^3, q = r/cut in [0, 1].
# sigma_3d = 105/(16 pi cut^3), sigma_2d = 5/(pi cut^2).
# dW/dr = -12 sigma q (1-q)^2 / cut  =>  wfd = -12 sigma (1-q)^2 / cut^2.
# This is the kernel upstream USER-SPH hard-codes in its pair styles.
# ---------------------------------------------------------------------------

def _lucy_sigma(cut, dim):
    if dim == 3:
        return 105.0 / (16.0 * math.pi) / (cut * cut * cut)
    return 5.0 / math.pi / (cut * cut)


# Formulation note (r3): per-lane divides are the slow VPU op in the pair
# kernels, so (1-q) powers are folded into plain (cut - r) powers with ALL
# cut-dependence moved into one constant built from divides. Divides by a
# scalar cut are loop-hoisted by the compiler (free); (cut - r) is exact
# for r in [cut/2, cut] (Sterbenz); and staying un-normalized skips two
# per-lane roundings — measured fp32 error vs the f64 kernel is ~2x BELOW
# the r2 1 - r/cut formulation (1.4e-7 vs 2.5e-7 of peak).

def lucy_w(r, cut, dim):
    s = _lucy_sigma(cut, dim)
    icut = 1.0 / cut
    q = jnp.clip(r * icut, 0.0, 1.0)
    s6 = ((s / cut) / cut) / cut
    d = jnp.maximum(cut - r, 0.0)
    return jnp.where(r < cut, s6 * (1.0 + 3.0 * q) * d * d * d, 0.0)


def lucy_wfd(r, cut, dim):
    s = _lucy_sigma(cut, dim)
    s5 = ((-12.0 * s) / cut) / cut
    d = jnp.maximum(cut - r, 0.0)
    return jnp.where(r < cut, (s5 / cut) / cut * (d * d), 0.0)


# ---------------------------------------------------------------------------
# Cubic spline (M4): support cut, internal h = cut/2, u = r/h in [0, 2].
# W = sigma * { 1 - 1.5 u^2 + 0.75 u^3        , u <= 1
#             { 0.25 (2 - u)^3                , 1 < u <= 2
# sigma_3d = 1/(pi h^3), sigma_2d = 10/(7 pi h^2).
# ---------------------------------------------------------------------------

def _cubic_sigma(h, dim):
    if dim == 3:
        return 1.0 / (math.pi * h * h * h)
    return 10.0 / (7.0 * math.pi * h * h)


def cubic_w(r, cut, dim):
    h = cut / 2.0
    u = jnp.clip(r / h, 0.0, 2.0)
    s = _cubic_sigma(h, dim)
    inner = 1.0 - 1.5 * u * u + 0.75 * u * u * u
    tmu = 2.0 - u
    outer = 0.25 * tmu * tmu * tmu
    return jnp.where(r < cut, s * jnp.where(u <= 1.0, inner, outer), 0.0)


def cubic_wfd(r, cut, dim):
    h = cut / 2.0
    u = jnp.clip(r / h, 0.0, 2.0)
    s = _cubic_sigma(h, dim)
    # dW/du: inner = -3u + 2.25u^2 ; outer = -0.75 (2-u)^2
    # wfd = s * dW/du / (h * r); inner branch has u factor -> divide analytically:
    # inner: dW/du / u = -3 + 2.25 u  => wfd_inner = s (-3 + 2.25 u) / h^2
    tmu = 2.0 - u
    wfd_inner = s * (-3.0 + 2.25 * u) / (h * h)
    r_safe = jnp.where(r > 0.0, r, 1.0)
    wfd_outer = s * (-0.75 * tmu * tmu) / (h * r_safe)
    return jnp.where(r < cut, jnp.where(u <= 1.0, wfd_inner, wfd_outer), 0.0)


# ---------------------------------------------------------------------------
# Quintic spline (M6): support cut, internal h = cut/3, u = r/h in [0, 3].
# W = sigma [ (3-u)^5 - 6(2-u)^5 + 15(1-u)^5 ]   (each term only where arg > 0)
# sigma_3d = 1/(120 pi h^3), sigma_2d = 7/(478 pi h^2).
# ---------------------------------------------------------------------------

def _quintic_sigma(h, dim):
    if dim == 3:
        return 1.0 / (120.0 * math.pi * h * h * h)
    return 7.0 / (478.0 * math.pi * h * h)


def _plus_pow5(x):
    xp = jnp.maximum(x, 0.0)
    x2 = xp * xp
    return x2 * x2 * xp


def _plus_pow4(x):
    xp = jnp.maximum(x, 0.0)
    x2 = xp * xp
    return x2 * x2


def quintic_w(r, cut, dim):
    h = cut / 3.0
    u = jnp.clip(r / h, 0.0, 3.0)
    s = _quintic_sigma(h, dim)
    val = _plus_pow5(3.0 - u) - 6.0 * _plus_pow5(2.0 - u) + 15.0 * _plus_pow5(1.0 - u)
    return jnp.where(r < cut, s * val, 0.0)


def quintic_wfd(r, cut, dim):
    h = cut / 3.0
    u = jnp.clip(r / h, 0.0, 3.0)
    s = _quintic_sigma(h, dim)
    # dW/du = -5 [ (3-u)^4 - 6(2-u)^4 + 15(1-u)^4 ]
    dwdu = -5.0 * (
        _plus_pow4(3.0 - u) - 6.0 * _plus_pow4(2.0 - u) + 15.0 * _plus_pow4(1.0 - u)
    )
    # u -> 0 limit: dW/du -> -5 [81 - 96 + 15] u-term... expansion gives dW/du ~ -120 u + O(u^3)
    # so dW/du/u is finite; compute via series-safe division.
    u_safe = jnp.where(u > 1e-6, u, 1.0)
    ratio = jnp.where(u > 1e-6, dwdu / u_safe, -120.0)  # lim_{u->0} (dW/du)/u = -120
    return jnp.where(r < cut, s * ratio / (h * h), 0.0)


# ---------------------------------------------------------------------------
# Wendland C2: q = r/cut in [0, 1].
#   3D: W = sigma (1-q)^4 (4q + 1),  sigma = 21/(2 pi cut^3)
#   2D: same form,                   sigma = 7/(pi cut^2)
# dW/dq = sigma [ -4(1-q)^3 (4q+1) + 4(1-q)^4 ] = -20 sigma q (1-q)^3
# wfd = -20 sigma (1-q)^3 / cut^2.
# ---------------------------------------------------------------------------

def _wendland_sigma(cut, dim):
    if dim == 3:
        return 21.0 / (2.0 * math.pi) / (cut * cut * cut)
    return 7.0 / math.pi / (cut * cut)


def wendland_w(r, cut, dim):
    # un-normalized (cut - r) powers, cut-dependence folded into scalar
    # divides (see the r3 formulation note above lucy_w)
    s = _wendland_sigma(cut, dim)
    icut = 1.0 / cut
    q = jnp.clip(r * icut, 0.0, 1.0)
    s4 = (((s / cut) / cut) / cut) / cut
    d = jnp.maximum(cut - r, 0.0)
    d2 = d * d
    return jnp.where(r < cut, s4 * d2 * d2 * (4.0 * q + 1.0), 0.0)


def wendland_wfd(r, cut, dim):
    s = _wendland_sigma(cut, dim)
    s5 = ((((-20.0 * s) / cut) / cut) / cut) / cut
    d = jnp.maximum(cut - r, 0.0)
    return jnp.where(r < cut, (s5 / cut) * d * d * d, 0.0)


_W_FNS = {LUCY: lucy_w, CUBIC_SPLINE: cubic_w, QUINTIC_SPLINE: quintic_w, WENDLAND_C2: wendland_w}
_WFD_FNS = {LUCY: lucy_wfd, CUBIC_SPLINE: cubic_wfd, QUINTIC_SPLINE: quintic_wfd, WENDLAND_C2: wendland_wfd}


def kernel_w(kernel_id: int, dim: int):
    """Return w(r, cut) for a static kernel id and dimension."""
    return partial(_W_FNS[kernel_id], dim=dim)


def kernel_wfd(kernel_id: int, dim: int):
    """Return wfd(r, cut) = (1/r) dW/dr for a static kernel id and dimension."""
    return partial(_WFD_FNS[kernel_id], dim=dim)


def kernel_id_from_name(name: str) -> int:
    key = name.strip().lower().replace("_", "").replace("-", "")
    key = {"quinticspline": "quintic", "cubicspline": "cubic", "wendlandc2": "wendland"}.get(key, key)
    if key not in KERNEL_NAMES:
        raise ValueError(f"unknown SPH kernel '{name}' (have {sorted(KERNEL_NAMES)})")
    return KERNEL_NAMES[key]
