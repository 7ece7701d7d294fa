"""Batched entropic-OT (Sinkhorn) approximation of the spatial EMD metric.

The reference computes its headline spatial metric with an exact C++ EMD
solver per map frame (distance.py:100-143 via pyemd); this repo keeps that
exact path (ambisonics/emd.py, native min-cost flow) as the default. This
module adds the TPU-native fast path: the whole eval batch's power maps are
scored in ONE jitted call — log-domain Sinkhorn iterations are (B, N) x
(N, N) matvecs that ride the MXU, vs one LP per sample on the host.

EMD-hat semantics (pyemd extra_mass_penalty=-1) are preserved exactly in
structure: the solver moves min(|p|, |q|) mass under partial-matching
constraints and charges the unmatched |sum p - sum q| at the maximum ground
distance. Partial matching is reduced to balanced OT with one zero-cost
dustbin node per side (the larger histogram's surplus flows to the dustbin
for free, which is exactly "not moved"); the mass-mismatch penalty is added
in closed form; the transport itself is solved on the DIFFERENCE measures
(valid because the ground cost is a metric — see emd_hat_sinkhorn). With
epsilon annealing the result matches the exact solver to ~5e-8 (emd/dir,
penalty-dominated) and ~1e-5 absolute / <0.5% relative (emd/dir2,
transport-dominated) on the eval meshes — pinned in tests/test_sinkhorn.py.
"""

from __future__ import annotations

import functools

import numpy as np

DEFAULT_EPSILON = 0.02   # cost scale is radians in [0, pi]
DEFAULT_ITERS = 200


def _logsumexp(x, axis):
    from jax.nn import logsumexp  # handles all -inf slices via the same
                                  # finite-max shift this module needs

    return logsumexp(x, axis=axis)


def sinkhorn_cost(p, q, cost, epsilon: float = DEFAULT_EPSILON,
                  n_iters: int = DEFAULT_ITERS):
    """Balanced entropic-OT transport cost, batched.

    p: (B, N) and q: (B, M) nonnegative histograms with equal per-row sums
    (caller guarantees balance — see emd_hat_sinkhorn); cost: (N, M) ground
    distances. Returns (B,) sum(P * cost) of the regularized plan at the
    final epsilon. Log-domain updates under lax.scan with epsilon annealing
    (geometric schedule from ~cost scale down to `epsilon` — warm-started
    duals converge far faster per iteration than a fixed small epsilon);
    stable for empty bins (mass 0 -> log -> -inf row drops out of the plan).
    """
    import jax.numpy as jnp
    from jax import lax

    # 1e-30 floor: must stay a NORMAL f32 (subnormals are flushed to zero
    # on XLA:CPU/TPU, and log(0) = -inf poisons the duals with inf - inf)
    log_p = jnp.log(p + 1e-30)
    log_q = jnp.log(q + 1e-30)
    # Static annealing schedule (cost may be a tracer): start 32x hotter
    # (0.64 at the default epsilon ~ the pi-scale mesh costs / 5), anneal
    # geometrically over the first half, polish at `epsilon`.
    eps_hi = 32.0 * epsilon
    n_anneal = n_iters // 2
    schedule = np.concatenate([
        np.geomspace(eps_hi, epsilon, max(n_anneal, 1)),
        np.full(n_iters - max(n_anneal, 1), epsilon)]).astype(np.float32)

    def body(carry, eps):
        f, g = carry
        # f_i = eps*log p_i - eps*LSE_j[(g_j - C_ij)/eps]
        f = eps * (log_p - _logsumexp((g[:, None, :] - cost[None]) / eps, 2))
        g = eps * (log_q - _logsumexp((f[:, :, None] - cost[None]) / eps, 1))
        return (f, g), None

    f0 = jnp.zeros_like(log_p)
    g0 = jnp.zeros_like(log_q)
    (f, g), _ = lax.scan(body, (f0, g0), jnp.asarray(schedule))
    # final f-update pins the row marginals exactly before reading the plan
    f = epsilon * (log_p - _logsumexp((g[:, None, :] - cost[None]) / epsilon, 2))
    log_plan = (f[:, :, None] + g[:, None, :] - cost[None]) / epsilon
    return jnp.sum(jnp.exp(log_plan) * cost[None], axis=(1, 2))


def emd_hat_sinkhorn(p, q, cost, epsilon: float = DEFAULT_EPSILON,
                     n_iters: int = DEFAULT_ITERS):
    """Batched EMD-hat (pyemd extra_mass_penalty=-1 semantics), approximate.

    p, q: (B, N) nonnegative histograms with arbitrary (unequal) masses;
    cost: (N, N) — must be a METRIC (true for the mesh's great-circle
    distances). Mirrors ambisonics/emd.py emd_hat: moves min-mass under
    partial matching (dustbin reduction) + |sum p - sum q| * cost.max().

    Solved on the DIFFERENCE measures (p-q)+ vs (q-p)+: under a metric
    cost the optimal flow never moves the shared mass min(p, q), so the
    value is unchanged — and it removes the shared-mass diagonal that
    otherwise traps Sinkhorn at small epsilon (the near-identical-maps
    regime converges to a plan that parks everything in place and
    under-reports the residual transport by 10x; measured).
    """
    import jax.numpy as jnp

    mass_p = jnp.sum(p, axis=1)
    mass_q = jnp.sum(q, axis=1)
    p, q = jnp.maximum(p - q, 0.0), jnp.maximum(q - p, 0.0)
    total = jnp.maximum(jnp.sum(p, axis=1), jnp.sum(q, axis=1))
    scale = jnp.maximum(total, 1e-30)
    # One dustbin per side: zero ground cost, so surplus parks there free —
    # identical to the exact solver's "surplus is simply not moved".
    # (sum p - sum q is invariant under the difference-measure rewrite.)
    p_aug = jnp.concatenate(
        [p, jnp.maximum(mass_q - mass_p, 0.0)[:, None]], axis=1) / scale[:, None]
    q_aug = jnp.concatenate(
        [q, jnp.maximum(mass_p - mass_q, 0.0)[:, None]], axis=1) / scale[:, None]
    n, m = p.shape[1], q.shape[1]
    cost_aug = jnp.zeros((n + 1, m + 1), cost.dtype).at[:n, :m].set(cost)
    moved = sinkhorn_cost(p_aug, q_aug, cost_aug, epsilon, n_iters) * scale
    penalty = jnp.abs(mass_p - mass_q) * jnp.max(cost)
    # Degenerate all-empty pair: the plan is all-dustbin, cost already 0.
    return moved + penalty


@functools.lru_cache(maxsize=4)
def _mesh_arrays(ang_res: float):
    """(ground-distance matrix, node count) for the eval mesh, host-side."""
    from spatialaudiogen_tpu.ambisonics.emd import mesh_ground_distance
    from spatialaudiogen_tpu.ambisonics.maps import spherical_mesh

    phi, nu = spherical_mesh(ang_res, inclusive_nu=True)
    dist = mesh_ground_distance(phi, nu)
    return np.asarray(dist, np.float32), phi.size


@functools.lru_cache(maxsize=4)
def _sph_mat(ang_res: float, order: int):
    from spatialaudiogen_tpu.ambisonics.maps import mesh_decoder, spherical_mesh

    phi, nu = spherical_mesh(ang_res, inclusive_nu=True)
    return np.asarray(mesh_decoder(phi, nu, order).sph_mat, np.float32)


def ambix_emd_batch_fn(rate: int, ang_res: float, order: int = 1,
                       window: float = 0.1, epsilon: float = DEFAULT_EPSILON,
                       n_iters: int = DEFAULT_ITERS):
    """Build a jittable (pred, gt) -> (emd_dir, emd_dir2) batch metric.

    pred/gt: (B, T, C) full ambisonic signals (W + decoded channels, already
    layout-masked like the host path, evaluator.py). Power maps are decoded
    on-device (one MXU matmul, maps.spherical_power_maps_jnp) and both EMD
    variants of every map frame of every sample are solved in one batched
    Sinkhorn — the device twin of ambisonics/emd.py ambix_emd
    (reference distance.py:129-143).
    """
    import jax.numpy as jnp

    from spatialaudiogen_tpu.ambisonics.maps import spherical_power_maps_jnp

    dist_np, n_nodes = _mesh_arrays(ang_res)
    sph_np = _sph_mat(ang_res, order)
    window_frames = int(window * rate)

    def metric(pred, gt):
        dist = jnp.asarray(dist_np)
        sph = jnp.asarray(sph_np)
        b = pred.shape[0]
        m1 = spherical_power_maps_jnp(pred, sph, window_frames)  # (B, F, G)
        m2 = spherical_power_maps_jnp(gt, sph, window_frames)
        f = m1.shape[1]
        m1 = m1.reshape(b * f, n_nodes)
        m2 = m2.reshape(b * f, n_nodes)
        # Variant 1 (emd/dir): raw mass / node count, mismatch penalized.
        d1 = emd_hat_sinkhorn(m1 / n_nodes, m2 / n_nodes, dist, epsilon, n_iters)
        # Variant 2 (emd/dir2): per-map ~unit normalization.
        n1 = m1 / (jnp.sum(m1, axis=1, keepdims=True) + 0.01)
        n2 = m2 / (jnp.sum(m2, axis=1, keepdims=True) + 0.01)
        d2 = emd_hat_sinkhorn(n1, n2, dist, epsilon, n_iters)
        return (jnp.mean(d1.reshape(b, f), axis=1),
                jnp.mean(d2.reshape(b, f), axis=1))

    return metric
