"""ALiBi attention, Transformer, Conformer (reference: networks/transformers.py).

The reference's Conformer carries two latent bugs (nonexistent
`self.out_channels` at transformers.py:323-324 and an unsupported `activation`
kwarg passed to Attention at transformers.py:353) — fixed here, per
SURVEY.md §7 stage 8.

TPU notes: attention is einsum-based (MXU); the ALiBi bias matrix is a
trace-time numpy constant (it is data-independent), supporting asymmetric
cross-attention contexts and cropping exactly like the reference
(transformers.py:79-93).
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def alibi_matrix(context_x: int, context_y: Optional[int] = None, n_heads: int = 8) -> np.ndarray:
    """ALiBi positional bias (arXiv:2108.12409) with cross-attention support
    for asymmetric contexts (reference: networks/transformers.py:7-93).

    Returns (n_heads, context_x, context_y); entry [h, i, j] = -|i' - j'| *
    2^(-8/(n_heads - h)) following the reference's symmetric construction,
    extended along the longer axis with the -(lower_len+k)..-k ramp pattern.
    """
    if context_y is None:
        context_y = context_x
    lower = min(context_x, context_y)
    diff = abs(context_x - context_y)

    M = np.zeros((lower, lower), dtype=np.float32)
    for i in range(1, lower):
        M += np.diag(-i * np.ones(lower - i, dtype=np.float32), -i)
    M = M + M.T

    if diff > 0:
        # extend along the longer side so M is (context_x, context_y):
        # rows = query positions, columns = key positions
        axis = 0 if context_x > context_y else 1
        blocks = [M]
        for i in range(diff):
            vec = np.arange(-lower - i, -i, dtype=np.float32)
            blocks.append(np.expand_dims(vec, axis))
        M = np.concatenate(blocks, axis=axis)

    # head scalars 2^(-8/h) for h = n_heads..1 (reference transformers.py:38-39)
    n_seq = np.arange(n_heads, 0, -1, dtype=np.float32)
    scalars = 2.0 ** (-8.0 / n_seq)
    return M[None, :, :] * scalars[:, None, None]


class Attention(nn.Module):
    """MHA with optional ALiBi bias or learned positional embeddings; supports
    cross-attention with y as K/V (reference: networks/transformers.py:95-191)."""

    dim: int
    dim_head: int = 64
    n_heads: int = 8
    dropout: float = 0.0
    use_bias: bool = False
    context_x: int = 32
    context_y: Optional[int] = None
    has_pos_emb: bool = True
    alibi: bool = True
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, y=None):
        inner = self.dim_head * self.n_heads
        x = nn.LayerNorm()(x)

        cross = y is not None
        add_pos = self.has_pos_emb and not self.alibi
        if cross:
            if add_pos:
                x = x + self.param("pos_emb_x", nn.initializers.normal(1.0), (1, self.context_x, self.dim))
                y = y + self.param("pos_emb_y", nn.initializers.normal(1.0), (1, self.context_y, self.dim))
            q_in, kv_in = x, y
        else:
            if add_pos:
                x = x + self.param("pos_emb", nn.initializers.normal(1.0), (1, self.context_x, self.dim))
            q_in, kv_in = x, x

        q = nn.Dense(inner, use_bias=self.use_bias, name="W_q")(q_in)
        k = nn.Dense(inner, use_bias=self.use_bias, name="W_k")(kv_in)
        v = nn.Dense(inner, use_bias=self.use_bias, name="W_v")(kv_in)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.n_heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        att = jnp.einsum("bhik,bhjk->bhij", q, k, preferred_element_type=jnp.float32)
        att = att / np.sqrt(self.dim_head)

        if self.has_pos_emb and self.alibi:
            cx = self.context_x
            cy = self.context_y if (cross and self.context_y is not None) else self.context_x
            M = alibi_matrix(cx, cy, self.n_heads)
            crop_x, crop_y = att.shape[-2], att.shape[-1]
            att = att + jnp.asarray(M[None, :, :crop_x, :crop_y])

        att = jax.nn.softmax(att, axis=-1)
        if self.dropout > 0 and not self.deterministic:
            att = nn.Dropout(rate=self.dropout, deterministic=False)(att)
        out = jnp.einsum("bhij,bhjk->bhik", att, v, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], -1, inner)
        out = nn.Dense(self.dim, use_bias=self.use_bias, name="W_o")(out)
        if self.dropout > 0 and not self.deterministic:
            out = nn.Dropout(rate=self.dropout, deterministic=False)(out)
        return out


class FeedForward(nn.Module):
    """Pre-LN MLP (reference: networks/transformers.py:193-223)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    activation: Callable = jax.nn.gelu
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.hidden_dim)(x)
        x = self.activation(x)
        if self.dropout > 0 and not self.deterministic:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        x = nn.Dense(self.dim)(x)
        if self.dropout > 0 and not self.deterministic:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        return x


class Transformer(nn.Module):
    """depth x (x + attn; x + ff); cross-attention only in the first layer
    (reference: networks/transformers.py:225-279)."""

    dim: int
    depth: int = 1
    heads: int = 8
    head_dim: int = 64
    dropout: float = 0.0
    context_x: int = 32
    context_y: Optional[int] = None
    has_pos_emb: bool = True
    alibi: bool = True
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, y=None):
        context_y = self.context_y
        for i in range(self.depth):
            x = x + Attention(
                dim=self.dim,
                n_heads=self.heads,
                dim_head=self.head_dim,
                dropout=self.dropout,
                context_x=self.context_x,
                context_y=context_y,
                has_pos_emb=(i == 0) and self.has_pos_emb,
                alibi=self.alibi,
                deterministic=self.deterministic,
                name=f"attn{i}",
            )(x, y=y if i == 0 else None)
            x = x + FeedForward(
                dim=self.dim,
                hidden_dim=self.dim,
                dropout=self.dropout,
                deterministic=self.deterministic,
                name=f"ff{i}",
            )(x)
            context_y = None
        return x


class ConformerConvBlock(nn.Module):
    """LN -> 1x1 conv (2x) -> GLU -> depthwise conv -> BN -> SiLU -> 1x1 conv
    (reference: networks/transformers.py:281-335, with the out_channels bug
    fixed). Input (B, N, D) channels-last throughout."""

    kernel_size: int = 17
    dropout: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.LayerNorm()(x)
        h = nn.Dense(2 * d, name="pointwise_in")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU
        # depthwise 'same' conv over time
        w = self.param(
            "dw_kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, 1, d),
        )
        from audio_generation_tpu.ops import same_conv1d

        h = same_conv1d(h, w, groups=d)
        h = nn.BatchNorm(use_running_average=self.deterministic, name="bn")(h)
        h = jax.nn.silu(h)
        h = nn.Dense(d, name="pointwise_out")(h)
        if self.dropout > 0 and not self.deterministic:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        return h


class ConformerBlock(nn.Module):
    """ff/2 + attn + conv + ff/2 sandwich with final LN
    (reference: networks/transformers.py:337-368, bugs fixed)."""

    dim: int
    hidden_dim_ratio: int = 4
    heads: int = 8
    dropout: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        x = x + 0.5 * FeedForward(
            dim=self.dim,
            hidden_dim=self.dim * self.hidden_dim_ratio,
            dropout=self.dropout,
            activation=jax.nn.silu,
            deterministic=self.deterministic,
            name="ff1",
        )(x)
        x = x + Attention(
            dim=self.dim,
            n_heads=self.heads,
            dim_head=self.dim // self.heads,
            dropout=self.dropout,
            context_x=x.shape[1],
            deterministic=self.deterministic,
            name="attn",
        )(x)
        x = x + ConformerConvBlock(
            dropout=self.dropout, deterministic=self.deterministic, name="conv"
        )(x)
        x = x + 0.5 * FeedForward(
            dim=self.dim,
            hidden_dim=self.dim * self.hidden_dim_ratio,
            dropout=self.dropout,
            activation=jax.nn.silu,
            deterministic=self.deterministic,
            name="ff2",
        )(x)
        return nn.LayerNorm()(x)
