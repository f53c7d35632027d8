"""Ring attention: sequence-parallel exact softmax attention over a mesh axis.

The reference has no sequence/context parallelism — it scales sequence length
algorithmically (local + linear attention; SURVEY.md §5) and is capped at
1024 tokens.  This op removes that cap the TPU way: Q/K/V shard over a mesh
axis along the sequence dimension; each device's K/V shard rotates around
the ring (``lax.ppermute`` → ICI neighbor exchange) while every device
accumulates its queries' online-softmax state.  After ``n`` hops the result
equals full attention, with O(L/n) memory per device and communication
overlapping compute.

``ring_attention`` is the user-facing wrapper (builds the shard_map);
``ring_attention_sharded`` is the collective body for use inside an existing
shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e9


def ring_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    padding_mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Per-device body. q, k, v: (B, H, L_shard, D); padding_mask: (B, L_shard)
    marking PAD keys of the *local* shard (True = masked)."""
    B, H, Ls, D = q.shape
    scale = D ** -0.5 if scale is None else scale
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    qf = q.astype(jnp.float32) * scale
    if padding_mask is None:
        padding_mask = jnp.zeros((B, Ls), bool)

    m0 = jnp.full((B, H, Ls, 1), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((B, H, Ls, 1), jnp.float32)
    a0 = jnp.zeros((B, H, Ls, D), jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(i, carry):
        k_cur, v_cur, mask_cur, m, s, acc = carry
        dots = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        dots = jnp.where(mask_cur[:, None, None, :], NEG_INF, dots)
        m_new = jnp.maximum(m, jnp.max(dots, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        e = jnp.exp(dots - m_new)
        s_new = s * corr + jnp.sum(e, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", e, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        # rotate the K/V/mask shard to the next device (no-op content on the
        # last iteration, but keeping it unconditional pipelines cleanly)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        mask_nxt = jax.lax.ppermute(mask_cur, axis_name, perm)
        return k_nxt, v_nxt, mask_nxt, m_new, s_new, acc_new

    _, _, _, m, s, acc = jax.lax.fori_loop(
        0, n, body, (k, v, padding_mask, m0, s0, a0)
    )
    return (acc / s).astype(v.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "tp",
    padding_mask: jax.Array | None = None,
) -> jax.Array:
    """Full arrays in, full arrays out; sequence dim sharded over ``axis``.

    q, k, v: (B, H, L, D) with L divisible by the axis size."""
    qkv_spec = P(None, None, axis, None)
    mask_spec = P(None, axis)

    if padding_mask is None:
        B, _, L, _ = q.shape
        padding_mask = jnp.zeros((B, L), bool)

    def body(q_s, k_s, v_s, mask_s):
        return ring_attention_sharded(
            q_s, k_s, v_s, axis_name=axis, padding_mask=mask_s
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return fn(q, k, v, padding_mask)
