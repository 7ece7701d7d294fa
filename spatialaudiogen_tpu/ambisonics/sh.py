"""Real spherical harmonics, vectorized (numpy host path + jnp device path).

Convention matches the reference (pyutils/ambisonics/common.py:151-178):

    Y_n^m(phi, nu) = (-1)^m * N(n, m) * P_n^{|m|}(sin nu)
                     * (cos(|m| phi) if m >= 0 else sin(|m| phi))

where `phi` is azimuth, `nu` elevation, P includes the Condon-Shortley phase
(scipy.special.lpmv), and N is the normalization factor from format.py.
The leading (-1)^m cancels the Condon-Shortley phase.

Two implementations are provided:
  * `spherical_harmonics_matrix` / `sh_matrix_polar`: numpy, any order
    (scipy lpmv), used for host DSP (encoding, decoding grids, eval maps).
  * `sh_matrix_polar_jnp`: closed-form orders 0..3, jittable, used on-device
    (e.g. batched spherical power maps in the deploy overlay and EMD prep).
"""

from __future__ import annotations

import numpy as np

from spatialaudiogen_tpu.ambisonics.format import (
    DEFAULT_NORMALIZATION,
    DEFAULT_ORDERING,
    index_to_degree_order,
    normalization_factor,
)


def _assoc_legendre(m: int, n: int, x: np.ndarray) -> np.ndarray:
    """P_n^m(x) with Condon-Shortley phase (scipy.special.lpmv)."""
    from scipy.special import lpmv

    return lpmv(m, n, x)


def spherical_harmonic_mn(order: int, degree: int, phi, nu,
                          normalization: str = DEFAULT_NORMALIZATION):
    """Single real SH term; `phi`/`nu` may be scalars or arrays."""
    phi = np.asarray(phi, dtype=np.float64)
    nu = np.asarray(nu, dtype=np.float64)
    # Index under ACN only feeds the normalization lookup (n, m invariant).
    from spatialaudiogen_tpu.ambisonics.format import degree_order_to_index

    norm = normalization_factor(degree_order_to_index(order, degree), normalization=normalization)
    am = abs(degree)
    angular = np.cos(am * phi) if degree >= 0 else np.sin(am * phi)
    return (-1.0) ** degree * norm * _assoc_legendre(am, order, np.sin(nu)) * angular


def sh_matrix_polar(phi: np.ndarray, nu: np.ndarray, max_order: int,
                    ordering: str = DEFAULT_ORDERING,
                    normalization: str = DEFAULT_NORMALIZATION) -> np.ndarray:
    """SH matrix for arrays of angles: returns (len(phi), (max_order+1)^2)."""
    phi = np.asarray(phi, dtype=np.float64).reshape(-1)
    nu = np.asarray(nu, dtype=np.float64).reshape(-1)
    num_channels = int((max_order + 1) ** 2)
    Y = np.zeros((phi.size, num_channels), dtype=np.float64)
    for i in range(num_channels):
        n, m = index_to_degree_order(i, ordering)
        Y[:, i] = spherical_harmonic_mn(n, m, phi, nu, normalization)
    return Y


def spherical_harmonics(position, max_order: int,
                        ordering: str = DEFAULT_ORDERING,
                        normalization: str = DEFAULT_NORMALIZATION) -> np.ndarray:
    """SH vector for a single Position (compat with reference common.py:160-168)."""
    return sh_matrix_polar(position.phi, position.nu, max_order, ordering, normalization)[0]


def spherical_harmonics_matrix(positions, max_order: int,
                               ordering: str = DEFAULT_ORDERING,
                               normalization: str = DEFAULT_NORMALIZATION) -> np.ndarray:
    """SH matrix (num_positions, num_channels) from a list of Position objects."""
    phi = np.array([p.phi for p in positions], dtype=np.float64)
    nu = np.array([p.nu for p in positions], dtype=np.float64)
    return sh_matrix_polar(phi, nu, max_order, ordering, normalization)


# ---------------------------------------------------------------------------
# jnp closed-form path (orders 0..3), ACN ordering.
# ---------------------------------------------------------------------------

def sh_matrix_polar_jnp(phi, nu, max_order: int,
                        normalization: str = DEFAULT_NORMALIZATION):
    """Jittable SH matrix in ACN ordering for orders 0..3.

    phi, nu: jnp arrays of identical shape (...,). Returns (..., (order+1)^2).
    Closed forms below expand P_n^{|m|}(sin nu) with Condon-Shortley phase
    multiplied by (-1)^m (i.e. phase-free associated Legendre).
    """
    import jax.numpy as jnp

    assert 0 <= max_order <= 3, "closed-form jnp path supports orders 0..3"
    s = jnp.sin(nu)          # sin(elevation) = z on unit sphere
    c = jnp.cos(nu)          # cos(elevation)
    cols = []

    def norm(n, m):
        return normalization_factor(n * (n + 1) + m, "ACN", normalization)

    # n = 0
    cols.append(norm(0, 0) * jnp.ones_like(s))
    if max_order >= 1:
        # phase-free P_1^0 = s; P_1^1 = c
        cols.append(norm(1, -1) * c * jnp.sin(phi))
        cols.append(norm(1, 0) * s)
        cols.append(norm(1, 1) * c * jnp.cos(phi))
    if max_order >= 2:
        # P_2^0 = (3s^2-1)/2; P_2^1 = 3sc; P_2^2 = 3c^2
        cols.append(norm(2, -2) * 3.0 * c * c * jnp.sin(2 * phi))
        cols.append(norm(2, -1) * 3.0 * s * c * jnp.sin(phi))
        cols.append(norm(2, 0) * 0.5 * (3.0 * s * s - 1.0))
        cols.append(norm(2, 1) * 3.0 * s * c * jnp.cos(phi))
        cols.append(norm(2, 2) * 3.0 * c * c * jnp.cos(2 * phi))
    if max_order >= 3:
        # P_3^0 = (5s^3-3s)/2; P_3^1 = c(15s^2-3)/2; P_3^2 = 15sc^2; P_3^3 = 15c^3
        cols.append(norm(3, -3) * 15.0 * c ** 3 * jnp.sin(3 * phi))
        cols.append(norm(3, -2) * 15.0 * s * c * c * jnp.sin(2 * phi))
        cols.append(norm(3, -1) * 0.5 * (15.0 * s * s - 3.0) * c * jnp.sin(phi))
        cols.append(norm(3, 0) * 0.5 * (5.0 * s ** 3 - 3.0 * s))
        cols.append(norm(3, 1) * 0.5 * (15.0 * s * s - 3.0) * c * jnp.cos(phi))
        cols.append(norm(3, 2) * 15.0 * s * c * c * jnp.cos(2 * phi))
        cols.append(norm(3, 3) * 15.0 * c ** 3 * jnp.cos(3 * phi))
    return jnp.stack(cols, axis=-1)
