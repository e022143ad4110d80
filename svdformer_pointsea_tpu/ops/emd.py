"""Auction-algorithm Earth Mover's Distance approximation.

TPU-native reformulation of metrics/EMD/emd_cuda.cu: the CUDA version
compacts unassigned points with shared-memory scans and launches Bid /
GetMax / Assign kernels per iteration; here each auction iteration is a
dense, fixed-shape masked phase inside ``lax.while_loop`` — bids via a tiled
top-2 value search (MXU matmuls), winner resolution via deterministic
batched scatter-max/min instead of atomics.

Contract (metrics/EMD/emd_module.py:1-19):
- xyz1, xyz2: (B, n, 3), equal sizes, coordinates ideally in [0, 1];
- returns (dist, assignment): squared matched distances (B, n) and the int32
  index of the matched xyz2 point per xyz1 point (approximate, not
  guaranteed a bijection);
- gradient flows only to xyz1;
- recommended operating points: train eps=0.005/iters=50, eval
  eps=0.002/iters=10000 (metrics/EMD/README.md:7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_VALUE_BASE = 3.0  # CUDA bid value = 3.0 - ||p-q|| - price (emd_cuda.cu:95-179)


def _top2_values(x1: Array, x2: Array, price: Array, chunk: int):
    """Best / second-best auction value and best index for every bidder.

    value[i, j] = 3.0 - ||x1_i - x2_j|| - price[j]; tiled over xyz2 chunks.
    Returns (v1, v2, j_star) each (B, n).
    """
    B, n, _ = x1.shape
    m = x2.shape[1]
    x1sq = jnp.sum(x1**2, axis=-1)

    def scan_body(carry, tile):
        v1, v2, j1 = carry
        x2_c, price_c, base = tile  # (B, chunk, 3), (B, chunk), ()
        inner = jnp.einsum(
            "bnc,bmc->bnm",
            x1,
            x2_c,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        d2 = x1sq[:, :, None] - 2 * inner + jnp.sum(x2_c**2, axis=-1)[:, None, :]
        value = _VALUE_BASE - jnp.sqrt(jnp.maximum(d2, 0.0)) - price_c[:, None, :]
        cv1 = jnp.max(value, axis=-1)
        cj = jnp.argmax(value, axis=-1).astype(jnp.int32) + base
        masked = jnp.where(value == cv1[..., None], -jnp.inf, value)
        cv2 = jnp.max(masked, axis=-1)
        # Merge running (best, second-best) with this chunk's pair.
        new_v1 = jnp.maximum(v1, cv1)
        new_j1 = jnp.where(cv1 > v1, cj, j1)
        # If v1 stays the max, runner-up is max(v2, cv1); else max(cv2, v1).
        new_v2 = jnp.maximum(jnp.minimum(v1, cv1), jnp.where(v1 >= cv1, v2, cv2))
        return (new_v1, new_v2, new_j1), None

    n_chunks = m // chunk
    x2_tiles = jnp.moveaxis(x2.reshape(B, n_chunks, chunk, 3), 1, 0)
    price_tiles = jnp.moveaxis(price.reshape(B, n_chunks, chunk), 1, 0)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    init = (
        jnp.full((B, n), -jnp.inf),
        jnp.full((B, n), -jnp.inf),
        jnp.zeros((B, n), jnp.int32),
    )
    (v1, v2, j1), _ = lax.scan(scan_body, init, (x2_tiles, price_tiles, bases))
    return v1, v2, j1


def _auction_iteration(state, x1, x2, eps, chunk):
    assignment, assignment_inv, price, _ = state
    B, n, _ = x1.shape
    m = x2.shape[1]
    bidx = jnp.arange(B)[:, None]
    unass = assignment < 0  # (B, n)

    v1, v2, j_star = _top2_values(x1, x2, price, chunk)
    v2 = jnp.where(jnp.isfinite(v2), v2, v1)  # single-chunk degenerate case
    incr = v1 - v2 + eps  # (B, n)
    bid_incr = jnp.where(unass, incr, -jnp.inf)

    # Highest bid per object, deterministic (scatter-max, then min-index win).
    max_incr = (
        jnp.full((B, m), -jnp.inf).at[bidx, j_star].max(bid_incr)
    )  # (B, m)
    is_best = unass & (bid_incr == jnp.take_along_axis(max_incr, j_star, axis=1))
    i_ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (B, n))
    winner = (
        jnp.full((B, m), n, jnp.int32)
        .at[bidx, j_star]
        .min(jnp.where(is_best, i_ids, n))
    )
    has_winner = winner < n  # (B, m)

    # Price update for contested objects.
    new_price = jnp.where(has_winner, price + jnp.maximum(max_incr, 0.0), price)

    # Evict previous owners of reassigned objects. Two correctness traps:
    # (a) masked entries are routed to an out-of-bounds row and dropped — a
    #     read-modify-write at a dummy index collides with genuine writes
    #     (duplicate-index .set is unordered) and silently undoes evictions;
    # (b) assignment_inv is not cleared on eviction, so it can point at a
    #     bidder who has since won a different object — evict only if the
    #     bidder still owns *this* object.
    obj_ids = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None, :], (B, m))
    prev_owner = jnp.where(has_winner, assignment_inv, -1)  # (B, m)
    still_owns = (
        jnp.take_along_axis(assignment, jnp.maximum(prev_owner, 0), axis=1)
        == obj_ids
    )
    evict_rows = jnp.where((prev_owner >= 0) & still_owns, prev_owner, n)
    assignment = assignment.at[bidx, evict_rows].set(-1, mode="drop")
    # Assign winners (same dropped-write pattern).
    win_rows = jnp.where(has_winner, winner, n)
    assignment = assignment.at[bidx, win_rows].set(obj_ids, mode="drop")
    assignment_inv = jnp.where(has_winner, winner, assignment_inv)

    n_unassigned = jnp.sum((assignment < 0).astype(jnp.int32))
    return assignment, assignment_inv, new_price, n_unassigned


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def earth_mover_distance(xyz1: Array, xyz2: Array, eps: float = 0.005, iters: int = 50):
    """Approximate EMD via the auction algorithm.

    Args:
        xyz1: (B, n, 3) prediction (receives gradients).
        xyz2: (B, n, 3) target.
        eps: price-increment slack (accuracy/speed tradeoff).
        iters: max auction iterations.
    Returns:
        dist: (B, n) squared matched distances. NOTE: rows left unassigned
            when ``iters`` exhausts before the auction converges get
            dist=0, which *understates* EMD (the reference CUDA kernel
            returns the partial assignment the same way). Check
            ``emd_unassigned(assignment)`` when honesty matters — at the
            reference eval operating point (eps=0.002, iters=10000,
            metrics/EMD/README.md:7) it should be 0.
        assignment: (B, n) int32 match index into xyz2 (-1 if unassigned).
    """
    dist, assignment, _ = _emd_forward(xyz1, xyz2, eps, iters)
    return dist, assignment


def emd_unassigned(assignment: Array) -> Array:
    """Per-sample count of points the auction left unmatched (B,).

    Nonzero means ``earth_mover_distance``'s dist underestimates the true
    EMD for that sample — raise ``iters`` or ``eps``."""
    return jnp.sum((assignment < 0).astype(jnp.int32), axis=1)


def _emd_forward(xyz1, xyz2, eps, iters):
    x1 = xyz1.astype(jnp.float32)
    x2 = xyz2.astype(jnp.float32)
    B, n, _ = x1.shape
    m = x2.shape[1]
    chunk = _pick_chunk(m, B, n)

    init = (
        jnp.full((B, n), -1, jnp.int32),
        jnp.full((B, m), -1, jnp.int32),
        jnp.zeros((B, m), jnp.float32),
        jnp.int32(B * n),
    )

    def cond(carry):
        t, state = carry
        return (t < iters) & (state[3] > 0)

    def body(carry):
        t, state = carry
        return t + 1, _auction_iteration(state, x1, x2, eps, chunk)

    t, (assignment, _, _, _) = lax.while_loop(cond, body, (jnp.int32(0), init))

    matched = jnp.take_along_axis(x2, jnp.maximum(assignment, 0)[..., None], axis=1)
    dist = jnp.sum((x1 - matched) ** 2, axis=-1)
    dist = jnp.where(assignment >= 0, dist, 0.0)
    return dist, assignment, t


def emd_convergence(xyz1: Array, xyz2: Array, eps: float = 0.002,
                    iters: int = 10000):
    """Diagnostic EMD: ``(dist, assignment, iters_used)``.

    ``iters_used`` is the auction iteration at which every point was
    assigned (the while_loop's convergence-based early exit), or ``iters``
    if the budget exhausted first. Non-differentiable — use
    ``earth_mover_distance`` on any grad path.

    Measured practicality at the documented eval point (eps=0.002/
    iters=10000, metrics/EMD/README.md:7), n=8192 on chip
    (tools/emd_convergence_study.py + budget sweep, docs/STATUS.md
    round-5): permutation-like pairs converge in ~2 iterations (27 ms);
    every non-degenerate pair exhausts the budget (~25 s/call at B=2 —
    inherent to the auction at this density, the reference CUDA kernel
    iterates identically). For near-converged predictions (the usual
    trained-model eval) ``iters=2000`` reproduces the full-budget metric
    value exactly at 5x less cost with <=0.04% unassigned; for loosely
    matched pairs keep the full budget. Always check ``emd_unassigned``
    — unassigned rows zero their dist and understate EMD."""
    return _emd_forward(xyz1, xyz2, eps, iters)


def _pick_chunk(m: int, b: int, n: int) -> int:
    budget = max(1, (64 * 1024 * 1024) // max(1, 4 * b * n))
    chunk = 1
    for c in range(1, m + 1):
        if m % c == 0 and c <= budget:
            chunk = c
    return chunk


def _emd_fwd(xyz1, xyz2, eps, iters):
    dist, assignment, _ = _emd_forward(xyz1, xyz2, eps, iters)
    return (dist, assignment), (xyz1, xyz2, assignment)


def _emd_bwd(eps, iters, res, g):
    xyz1, xyz2, assignment = res
    g_dist, _ = g
    matched = jnp.take_along_axis(
        xyz2.astype(jnp.float32), jnp.maximum(assignment, 0)[..., None], axis=1
    )
    # Gradient only w.r.t. xyz1 (emd_module.py:73-81).
    grad1 = 2.0 * g_dist[..., None] * (xyz1 - matched)
    grad1 = jnp.where((assignment >= 0)[..., None], grad1, 0.0)
    return grad1, jnp.zeros_like(xyz2)


earth_mover_distance.defvjp(_emd_fwd, _emd_bwd)
