"""Chain materialization by binary lifting — the TPU-native replacement for
sequential token/anchor walks.

Both LZ4 parsing problems (decode: walk the token chain; encode: walk the
greedy anchor chain) are orbits of a strictly-increasing successor function
``nxt``.  Instead of marking reachable positions with pointer-doubling
scatters (O(log n) full-width scatter rounds) and then compacting, we
materialize the orbit directly:

    P[s] = position after s steps from 0

using jump tables: ``d_k = d_{k-1} ∘ d_{k-1}`` (gather-only doubling) and
``P[2^k : 2^{k+1}] = d_k[P[0 : 2^k]]`` (gathers on a small array).  The
orbit IS the sequence table, already in ascending order — no reachability
mask, no compaction, no scatter.

Cost: ceil(log2(max_steps)) full-width gathers for the jump tables plus
O(max_steps) small gathers — compared to the reference's O(n) sequential
walk (`x64/LL64.dec.cs:124-467`).
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import ceil_log2


def materialize_chain(nxt: jnp.ndarray, max_steps: int) -> jnp.ndarray:
    """Orbit of index 0 under ``nxt``.

    nxt: i32[m], strictly increasing (nxt[i] > i) except a self-loop at the
    terminal "dead" index m-1.
    Returns P: i32[max_steps] with P[s] = position after s steps (sticks at
    the dead index once reached).  max_steps is rounded up to a power of 2.
    """
    m = nxt.shape[0]
    k_max = ceil_log2(max_steps)
    cap = 1 << k_max
    p = jnp.full((cap,), m - 1, jnp.int32).at[0].set(0)
    d = nxt
    size = 1
    for _ in range(k_max):
        ext = d[jnp.clip(p[:size], 0, m - 1)]
        p = p.at[size : 2 * size].set(ext)
        size *= 2
        if size < cap:
            d = d[jnp.clip(d, 0, m - 1)]
    return p
