"""Small causal word-level transformer LM for sentence scoring.

The reference scores beam-search sentence candidates with a trained
DistilBERT-CoLA acceptability head (lipreading/sentence_eval.py:25-38).
That checkpoint needs network access; the in-framework equivalent is this
native LM pretrained on the dataset's own transcripts — a trained neural
scorer rather than the add-k bigram fallback, capturing longer-range
structure a bigram cannot (the quality gap is pinned by
tests/test_sentence_eval.py's A/B).

Architecture: learned word embedding + positional embedding → N pre-LN
causal transformer blocks (flash-attention primitive) → tied-embedding
logits. Word-level with an <unk> token: sentence-eval candidates are always
sequences over the classifier's own vocabulary, so word granularity matches
the scoring task exactly.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

PAD, BOS, EOS, UNK = 0, 1, 2, 3
_SPECIALS = ["<pad>", "<s>", "</s>", "<unk>"]


class WordLM(nn.Module):
    """tokens (B, S) int32 → next-token logits (B, S, V)."""

    vocab_size: int
    hidden: int = 64
    num_layers: int = 2
    num_heads: int = 4
    mlp_dim: int = 128
    max_len: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        from ..ops.attention import mha

        b, s = tokens.shape
        emb = self.param("embedding", nn.initializers.normal(0.02),
                         (self.vocab_size, self.hidden), jnp.float32)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (self.max_len, self.hidden), jnp.float32)
        x = emb[tokens].astype(self.dtype) + pos[:s].astype(self.dtype)
        for i in range(self.num_layers):
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(x)
            qkv = nn.Dense(3 * self.hidden, dtype=self.dtype, name=f"qkv_{i}")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            attn = mha(q, k, v, self.num_heads, causal=True)
            x = x + nn.Dense(self.hidden, dtype=self.dtype, name=f"proj_{i}")(attn)
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x)
            h = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"fc1_{i}")(h)
            h = nn.gelu(h)
            x = x + nn.Dense(self.hidden, dtype=self.dtype, name=f"fc2_{i}")(h)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_f")(x)
        return (x.astype(jnp.float32) @ emb.T)  # tied embedding head


def build_word_vocab(sentences: Sequence[str]) -> Dict[str, int]:
    vocab = dict(zip(_SPECIALS, range(len(_SPECIALS))))
    for s in sentences:
        for w in s.upper().split():
            vocab.setdefault(w, len(vocab))
    return vocab


def encode_sentences(
    sentences: Sequence[str], vocab: Dict[str, int], max_len: int
) -> np.ndarray:
    """<s> w1 … wn </s>, PAD-padded/truncated to max_len."""
    out = np.full((len(sentences), max_len), PAD, np.int32)
    for i, s in enumerate(sentences):
        ids = [BOS] + [vocab.get(w, UNK) for w in s.upper().split()][: max_len - 2] + [EOS]
        out[i, : len(ids)] = ids
    return out


def sequence_log_likelihood(params, model: WordLM, tokens: jax.Array) -> jax.Array:
    """Length-normalized log p(tokens) under the LM, ignoring PAD —
    (B,) per-sentence scores; the acceptability analog of the reference's
    CoLA log-softmax score (sentence_eval.py:25-34)."""
    logits = model.apply({"params": params}, tokens[:, :-1])
    logp = jax.nn.log_softmax(logits, axis=-1)
    targets = tokens[:, 1:]
    tok_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != PAD).astype(jnp.float32)
    return jnp.sum(tok_lp * mask, axis=-1) / jnp.maximum(jnp.sum(mask, axis=-1), 1.0)


def train_word_lm(
    sentences: Sequence[str],
    hidden: int = 64,
    num_layers: int = 2,
    num_heads: int = 4,
    mlp_dim: int = 128,
    max_len: int = 32,
    steps: int = 400,
    batch_size: int = 64,
    lr: float = 3e-3,
    seed: int = 0,
) -> Tuple[dict, Dict[str, int], WordLM]:
    """Pretrain on transcripts; returns (params, vocab, model).

    Tiny by design: transcripts are short and the vocabulary is the
    classifier's word list, so a 2-layer model converges in seconds.
    """
    import optax

    vocab = build_word_vocab(sentences)
    model = WordLM(vocab_size=len(vocab), hidden=hidden, num_layers=num_layers,
                   num_heads=num_heads, mlp_dim=mlp_dim, max_len=max_len)
    data = encode_sentences(sentences, vocab, max_len)
    key = jax.random.key(seed)
    params = model.init(key, jnp.zeros((1, max_len - 1), jnp.int32))["params"]
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, tokens):
        def loss_fn(p):
            logits = model.apply({"params": p}, tokens[:, :-1])
            logp = jax.nn.log_softmax(logits, axis=-1)
            targets = tokens[:, 1:]
            tok_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
            mask = (targets != PAD).astype(jnp.float32)
            return -jnp.sum(tok_lp * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    rng = np.random.default_rng(seed)
    for _ in range(steps):
        pick = rng.integers(0, len(data), min(batch_size, len(data)))
        params, opt, _ = step(params, opt, jnp.asarray(data[pick]))
    return params, vocab, model
