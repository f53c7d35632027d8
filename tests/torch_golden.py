"""Torch 'golden' models for parity tests.

Independent transcriptions of the third-party layer semantics the reference
depends on (lucidrains ``linear_attention_transformer==0.19.1`` +
``axial_positional_embedding==0.2.1`` + ``local_attention``), written from the
published algorithm descriptions.  They exist so the JAX implementation and
the weight converters can be validated without the pinned packages installed.
State-dict key names intentionally match the real packages so
``biom3_tpu.io.convert`` is exercised end-to-end.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def linear_attn(q, k, v):
    """Non-causal linear attention; q,k,v: (B, H, L, D)."""
    d = q.shape[-1]
    q = q.softmax(dim=-1) * d ** -0.5
    k = k.softmax(dim=-2)
    context = torch.einsum("bhnd,bhne->bhde", k, v)
    return torch.einsum("bhnd,bhde->bhne", q, context)


def look_around(x, backward=1, forward=1, pad_value=-1.0, dim=2):
    """(B, nw, W, ...) → (B, nw, (1+b+f)·W, ...) concat of shifted windows."""
    t = x.shape[1]
    dims = (len(x.shape) - dim) * (0, 0)
    padded = F.pad(x, (*dims, backward, forward), value=pad_value)
    tensors = [padded[:, ind : (ind + t), ...] for ind in range(forward + backward + 1)]
    return torch.cat(tensors, dim=dim)


def local_attn(q, k, v, window):
    """Non-causal local window attention, look_backward=1, look_forward=1."""
    shape = q.shape
    B, H, L, D = shape
    merge = lambda x: x.reshape(B * H, L, D)
    q, k, v = map(merge, (q, k, v))
    windows = L // window
    ticker = torch.arange(L, dtype=q.dtype)[None, :]
    b_t = ticker.reshape(1, windows, window)
    bq, bk, bv = map(lambda x: x.reshape(B * H, windows, window, -1), (q, k, v))
    bk = look_around(bk)
    bv = look_around(bv)
    bq_k = look_around(b_t)
    dots = torch.einsum("bhie,bhje->bhij", bq, bk) * (D ** -0.5)
    mask_value = -torch.finfo(dots.dtype).max
    mask = bq_k[:, :, None, :] == -1
    dots.masked_fill_(mask, mask_value)
    attn = dots.softmax(dim=-1)
    out = torch.einsum("bhij,bhje->bhie", attn, bv)
    return out.reshape(*shape)


class SelfAttention(nn.Module):
    """Split local/global heads (local heads FIRST), qkv bias-free."""

    def __init__(self, dim, heads, n_local_attn_heads, local_attn_window_size):
        super().__init__()
        self.heads = heads
        self.d_heads = dim // heads
        self.local_attn_heads = n_local_attn_heads
        self.window = local_attn_window_size
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(dim, dim, bias=False)
        self.to_v = nn.Linear(dim, dim, bias=False)
        self.to_out = nn.Linear(dim, dim)

    def forward(self, x):
        B, L, E = x.shape
        q, k, v = self.to_q(x), self.to_k(x), self.to_v(x)
        merge_heads = lambda t: t.reshape(B, L, self.heads, self.d_heads).transpose(1, 2)
        q, k, v = map(merge_heads, (q, k, v))
        nl = self.local_attn_heads
        out = []
        if nl > 0:
            out.append(local_attn(q[:, :nl], k[:, :nl], v[:, :nl], self.window))
        if self.heads - nl > 0:
            out.append(linear_attn(q[:, nl:], k[:, nl:], v[:, nl:]))
        attn = torch.cat(out, dim=1)
        attn = attn.transpose(1, 2).reshape(B, L, E)
        return self.to_out(attn)


class PreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x):
        return self.fn(self.norm(x))


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.w1 = nn.Linear(dim, dim * mult)
        self.w2 = nn.Linear(dim * mult, dim)

    def forward(self, x):
        return self.w2(F.gelu(self.w1(x)))


class Chunk(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return self.fn(x)


class SequentialSequence(nn.Module):
    def __init__(self, layers):
        super().__init__()
        self.layers = layers

    def forward(self, x):
        for f, g in self.layers:
            x = x + f(x)
            x = x + g(x)
        return x


class LinearAttentionTransformer(nn.Module):
    """depth-1 equivalent of the pinned package's transformer."""

    def __init__(self, dim, heads, n_local_attn_heads, local_attn_window_size):
        super().__init__()
        attn = SelfAttention(dim, heads, n_local_attn_heads, local_attn_window_size)
        ff = Chunk(FeedForward(dim))
        layers = nn.ModuleList(
            [nn.ModuleList([PreNorm(dim, attn), PreNorm(dim, ff)])]
        )
        self.layers = SequentialSequence(layers)

    def forward(self, x):
        return self.layers(x)


class AxialPositionalEmbedding(nn.Module):
    def __init__(self, dim, axial_shape):
        super().__init__()
        self.shape = axial_shape
        self.max_seq_len = axial_shape[0] * axial_shape[1]
        self.weights_0 = nn.Parameter(torch.zeros(1, axial_shape[0], 1, dim).normal_(0, 1))
        self.weights_1 = nn.Parameter(torch.zeros(1, 1, axial_shape[1], dim).normal_(0, 1))

    def forward(self, x):
        b, t, e = x.shape
        embs = []
        for w in (self.weights_0, self.weights_1):
            expand_shape = (b, *self.shape, w.shape[-1])
            embs.append(w.expand(expand_shape).reshape(b, self.max_seq_len, w.shape[-1]))
        return (embs[0] + embs[1])[:, :t]


class SinusoidalPosEmb(nn.Module):
    def __init__(self, dim, num_steps, rescale_steps=4000):
        super().__init__()
        self.dim = dim
        self.num_steps = float(num_steps)
        self.rescale_steps = float(rescale_steps)

    def forward(self, x):
        x = x / self.num_steps * self.rescale_steps
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = torch.exp(torch.arange(half_dim) * -emb)
        emb = x[:, None] * emb[None, :]
        return torch.cat((emb.sin(), emb.cos()), dim=-1)


class GoldenDiffTransformer(nn.Module):
    """Reference-semantics Stage-3 model (state-dict keys match the real one)."""

    def __init__(self, num_classes, dim, depth, n_blocks, max_seq_len,
                 num_timesteps, heads, n_local_attn_heads, local_attn_window_size,
                 cond_dim):
        super().__init__()
        self.emb_dim = dim
        self.depth = depth
        self.n_blocks = n_blocks
        self.x_emb_NN = nn.Embedding(num_classes, dim)
        self.y_mlp = nn.Sequential(
            nn.Linear(cond_dim, dim * 4), nn.Softplus(),
            nn.Linear(dim * 4, dim * n_blocks * depth),
        )
        self.time_pos_emb = SinusoidalPosEmb(dim, num_timesteps)
        self.mlp = nn.Sequential(
            nn.Linear(dim, dim * 4), nn.Softplus(),
            nn.Linear(dim * 4, dim * n_blocks * depth),
        )
        self.axial_pos_emb = AxialPositionalEmbedding(
            dim, (max_seq_len // local_attn_window_size, local_attn_window_size)
        )
        self.transformer_blocks = nn.ModuleList()
        for _ in range(n_blocks):
            block = nn.ModuleList()
            for _ in range(depth):
                block.append(LinearAttentionTransformer(
                    dim, heads, n_local_attn_heads, local_attn_window_size))
            self.transformer_blocks.append(block)
        self.norm = nn.LayerNorm(dim)
        self.out = nn.Linear(dim, num_classes)

    def forward(self, x, t, y_c):
        t = self.time_pos_emb(t)
        t = self.mlp(t)
        time_embed = t.reshape(x.size(0), 1, self.emb_dim, self.n_blocks, self.depth)
        x = self.x_emb_NN(x.long())
        x_pos = self.axial_pos_emb(x).type(x.type())
        x_embed_axial = x + x_pos
        h = torch.zeros_like(x_embed_axial)
        y_emb = self.y_mlp(y_c)
        y_emb = y_emb.reshape(x.size(0), 1, self.emb_dim, self.n_blocks, self.depth)
        for i, block in enumerate(self.transformer_blocks):
            h = h + x_embed_axial
            for j, transformer in enumerate(block):
                h = transformer(h + time_embed[..., i, j] + y_emb[..., i, j])
        h = self.norm(h)
        output = self.out(h)
        return output.permute(0, 2, 1)


@torch.no_grad()
def golden_temp0_denoise(model, paths, z_c):
    """Reference-semantics temperature-0 denoise loop.

    The reference's single-sample generation loop
    (``Stage3_source/sampling_analysis.py:152-201``): start all-absorbing,
    one model call per step t, write position sigma^-1(t) — with argmax in
    place of ``OneHotCategorical.sample()`` (the temperature-0 limit; the
    reference has no temperature knob).  This is the torch side of the
    Stage-3 parity gate: ``biom3_tpu``'s sampler at temperature 0 with the
    same injected permutation must reproduce it bit-for-bit.
    """
    model.eval()
    paths = torch.as_tensor(paths, dtype=torch.long)
    z_c = torch.as_tensor(z_c, dtype=torch.float32)
    B, L = paths.shape
    rows = torch.arange(B)
    x = torch.zeros((B, L), dtype=torch.long)
    for t in range(L):
        logits = model(x, torch.full((B,), t, dtype=torch.long), z_c)
        pos = (paths == t).long().argmax(dim=-1)          # (B,)
        picked = logits[rows, :, pos]                     # (B, C)
        x[rows, pos] = picked.argmax(dim=-1)
    return x.numpy()
