# -*- coding: utf-8 -*-
"""Shared encoder-layer library (flax.linen).

JAX re-design of the reference's encoder toolbox (``baselines/ghmfc.py``):
pooling primitives, multi-layer transformer, bidirectional cross-attention
and gated multimodal fusion — with no per-sample Python loops, and with
numerics matching torch's modules so golden-parity tests can load torch
weights and compare outputs bit-for-bit (within float tolerance).

Initialization follows torch defaults (Linear: U(-1/sqrt(fan_in), ..);
attention in-proj: Xavier-uniform with zero bias) so training dynamics match
statistically.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from drin_tpu.ops.core import span_mean

# ---------------------------------------------------------------------------
# init + activations (torch-compatible)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(-b, b) with
    b = 1/sqrt(fan_in).  flax kernels are [in, out] so fan_in = shape[0]."""
    bound = 1.0 / (shape[0] ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in**0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# torch nn.LayerNorm uses eps=1e-5 (flax default is 1e-6)
LayerNorm = functools.partial(nn.LayerNorm, epsilon=1e-5)


def get_activation(name: str) -> Callable:
    """Activation by name with torch numerics (gelu is the exact erf form —
    torch F.gelu default, not the tanh approximation)."""
    table = {
        "gelu": functools.partial(jax.nn.gelu, approximate=False),
        "relu": jax.nn.relu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "silu": jax.nn.silu,
        "elu": jax.nn.elu,
        "identity": lambda x: x,
    }
    return table[name]


class Linear(nn.Module):
    """nn.Dense with torch-default initialization."""

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
        )(x)


# ---------------------------------------------------------------------------
# pooling primitives (reference ghmfc.py:21-69)


class MaxPool(nn.Module):
    """max over an axis (reference MaxPool, ghmfc.py:29-35)."""

    axis: int = 1

    def __call__(self, seq, *args):
        return jnp.max(seq, axis=self.axis)


class AvgPool(nn.Module):
    axis: int = 1

    def __call__(self, seq, *args):
        return jnp.mean(seq, axis=self.axis)


class Avg(nn.Module):
    """Span-average of token features between per-sample begin:end —
    vectorized form of the reference's batch loop (ghmfc.py:54-60)."""

    def __call__(self, seq, begin, end, *args):
        return span_mean(seq, begin, end)


class AvgLinear(nn.Module):
    """Span-average followed by a projection (ghmfc.py:63-69)."""

    features: int

    @nn.compact
    def __call__(self, seq, begin, end, *args):
        return Linear(self.features, name="linear")(span_mean(seq, begin, end))


class Identity(nn.Module):
    def __call__(self, x, *args):
        return x


# ---------------------------------------------------------------------------
# attention


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible attention (batch_first).

    Supports distinct key/value dims (kdim/vdim) like the reference's
    text<->image cross attention (ghmfc.py:96-103).  Dropout on attention
    weights is applied only when ``deterministic=False``.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    kdim: Optional[int] = None
    vdim: Optional[int] = None

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None, deterministic: bool = True):
        E, H = self.embed_dim, self.num_heads
        head_dim = E // H
        assert head_dim * H == E, "embed_dim must be divisible by num_heads"
        kdim = self.kdim if self.kdim is not None else E
        vdim = self.vdim if self.vdim is not None else E
        if kdim == E and vdim == E:
            # torch packs q/k/v into one [3E, E] in_proj matrix and
            # xavier_uniform_s THAT, so each slice's bound is
            # sqrt(6/(E+3E)); per-matrix xavier on [E, E] would be
            # sqrt(2) larger.  variance_scaling(0.5, fan_avg, uniform)
            # reproduces the packed bound exactly: sqrt(3*0.5/E).
            xavier = nn.initializers.variance_scaling(0.5, "fan_avg", "uniform")
        else:
            # the kdim/vdim != embed_dim case: torch keeps separate
            # q/k/v_proj_weight matrices, each xavier'd individually
            xavier = nn.initializers.xavier_uniform()
        zeros = nn.initializers.zeros_init()
        q = nn.Dense(E, kernel_init=xavier, bias_init=zeros, name="q_proj")(query)
        k = nn.Dense(E, kernel_init=xavier, bias_init=zeros, name="k_proj")(key)
        v = nn.Dense(E, kernel_init=xavier, bias_init=zeros, name="v_proj")(value)
        B, Lq = q.shape[0], q.shape[1]
        Lk = k.shape[1]
        q = q.reshape(B, Lq, H, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, H, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, H, head_dim).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (head_dim**0.5)
        if key_padding_mask is not None:
            # True = position is masked out (torch semantics)
            neg = jnp.finfo(logits.dtype).min
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        if self.dropout > 0.0 and not deterministic:
            attn = nn.Dropout(self.dropout)(attn, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        # torch zeroes the out-proj bias; weight keeps Linear default init
        return nn.Dense(
            E, kernel_init=torch_linear_kernel_init, bias_init=zeros, name="out_proj"
        )(out)


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer (post-LN / norm_first=False)."""

    embed_dim: int
    num_heads: int
    ffn_hidden: int
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        act = get_activation(self.activation)
        attn_out = MultiheadAttention(
            self.embed_dim, self.num_heads, self.dropout, name="self_attn"
        )(x, x, x, key_padding_mask, deterministic)
        if self.dropout > 0.0 and not deterministic:
            attn_out = nn.Dropout(self.dropout)(attn_out, deterministic=False)
        x = LayerNorm(name="norm1")(x + attn_out)
        h = nn.Dense(
            self.ffn_hidden,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(self.embed_dim),
            name="linear1",
        )(x)
        h = act(h)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        h = nn.Dense(
            self.embed_dim,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(self.ffn_hidden),
            name="linear2",
        )(h)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        return LayerNorm(name="norm2")(x + h)


class MultilayerTransformer(nn.Module):
    """N-layer transformer encoder over BERT features (ghmfc.py:72-90)."""

    embed_dim: int
    num_layers: int
    num_heads: int
    ffn_hidden: int
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, seq, mask, *args, deterministic: bool = True):
        kpm = mask == 0
        for i in range(self.num_layers):
            seq = TransformerEncoderLayer(
                self.embed_dim,
                self.num_heads,
                self.ffn_hidden,
                self.dropout,
                self.activation,
                name=f"layer_{i}",
            )(seq, kpm, deterministic)
        return seq


class CrossAttention(nn.Module):
    """Bidirectional two-step cross-attention block (ghmfc.py:93-128):
    a attends to b, then the attended-b sequence attends back to a; four
    LayerNorms and two residual FFNs along the way."""

    dim_a: int
    dim_b: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, seq_a, mask_a, seq_b, mask_b=None, deterministic: bool = True):
        kpm_a = mask_a == 0
        kpm_b = (mask_b == 0) if mask_b is not None else jnp.zeros(seq_b.shape[:2], dtype=bool)
        attended_b = MultiheadAttention(
            self.dim_a, self.num_heads, self.dropout, kdim=self.dim_b, vdim=self.dim_b, name="a2b_attention"
        )(seq_a, seq_b, seq_b, kpm_b, deterministic)
        attended_b = LayerNorm(name="ln0")(attended_b)
        attended_b = Linear(self.dim_a, name="a2b_ffn")(attended_b) + attended_b
        attended_b = LayerNorm(name="ln1")(attended_b)
        attended_a = MultiheadAttention(self.dim_a, self.num_heads, self.dropout, name="b2a_attention")(
            attended_b, seq_a, seq_a, kpm_a, deterministic
        )
        attended_a = LayerNorm(name="ln2")(attended_a)
        attended_a = Linear(self.dim_a, name="b2a_ffn")(attended_a) + attended_a
        return LayerNorm(name="ln3")(attended_a)


class MultimodalFusion(nn.Module):
    """GHMFC's gated text/image fusion (ghmfc.py:131-149): two cross
    attentions, max-pool, per-modality projection + activation, a 2-way
    softmax gate, then the gate-weighted sum."""

    text_dim: int
    image_dim: int
    output_dim: int
    num_heads: int
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, text_seq, text_mask, image_seq, *args, deterministic: bool = True):
        act = get_activation(self.activation)
        image_mask = jnp.ones(image_seq.shape[:2], dtype=jnp.int32)
        t = CrossAttention(self.text_dim, self.image_dim, self.num_heads, self.dropout, name="t2v_attention")(
            text_seq, text_mask, image_seq, image_mask, deterministic
        )
        attended_text = act(Linear(self.output_dim, name="text_linear")(jnp.max(t, axis=1)))
        v = CrossAttention(self.image_dim, self.text_dim, self.num_heads, self.dropout, name="v2t_attention")(
            image_seq, image_mask, text_seq, text_mask, deterministic
        )
        attended_image = act(Linear(self.output_dim, name="image_linear")(jnp.max(v, axis=1)))
        score = jax.nn.softmax(
            Linear(2, name="score_linear")(jnp.concatenate([attended_text, attended_image], axis=1)),
            axis=-1,
        )
        stacked = jnp.stack([attended_text, attended_image], axis=1)  # [B, 2, D]
        return jnp.einsum("bk,bkd->bd", score, stacked)


# ---------------------------------------------------------------------------
# LSTM (for MELHI) — lax.scan over a torch-numerics cell


class LSTM(nn.Module):
    """Single-layer LSTM with torch nn.LSTM numerics, run as a lax.scan.

    Processes a padded batch [B, L, In] with per-row valid ``lengths``;
    returns the hidden state at the last valid step of every row (the
    reference feeds packed sequences and extracts the final state,
    melhi.py:18-41)."""

    hidden: int

    @nn.compact
    def __call__(self, x, lengths):
        B, L, _ = x.shape
        Hd = self.hidden
        bound = 1.0 / (Hd**0.5)
        uni = lambda key, shape, dtype=jnp.float32: jax.random.uniform(key, shape, dtype, -bound, bound)
        w_ih = self.param("w_ih", uni, (x.shape[-1], 4 * Hd))
        w_hh = self.param("w_hh", uni, (Hd, 4 * Hd))
        b_ih = self.param("b_ih", uni, (4 * Hd,))
        b_hh = self.param("b_hh", uni, (4 * Hd,))

        def step(carry, xt):
            h, c, t = carry
            gates = xt @ w_ih + b_ih + h @ w_hh + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            # freeze state past each row's valid length
            valid = (t < lengths)[:, None]
            h = jnp.where(valid, h_new, h)
            c = jnp.where(valid, c_new, c)
            return (h, c, t + 1), None

        h0 = jnp.zeros((B, Hd), x.dtype)
        (h, _, _), _ = jax.lax.scan(step, (h0, h0, jnp.array(0)), x.transpose(1, 0, 2))
        return h
