"""Train the text-conditioned lipreading expert (character seq2seq).

The reference downloads a pretrained fairseq AV-HuBERT ensemble
(gan-model/avhubert_utils.py:71-110) and freezes most of it
(train_lipreading.py:113-134). With no torch runtime here, the expert is
trainable in-framework instead (like the SyncNet expert,
pipelines/train_syncnet.py): teacher-forced character CE over (mouth
window, transcript) pairs. The trained params then plug into the GAN's
``--lipreading`` loss (train_gan.gan_train_step's text-conditioned path).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..models.lip_expert import (
    LipExpertSeq2Seq,
    avhubert_video_transform,
    seq2seq_expert_loss,
)


@flax.struct.dataclass
class LipExpertTrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # the model travels with the state (static treedef leaf) so train_step /
    # eval code need no separate size plumbing — smaller experts for CPU
    # proof tiers, the AV-HuBERT-scale default for production
    model: LipExpertSeq2Seq = flax.struct.field(
        pytree_node=False, default=None)


def default_expert(max_text_len: int = 48, embed_dim: int = 256,
                   enc_layers: int = 2, dec_layers: int = 2,
                   num_heads: int = 4, stem_base: int = 64) -> LipExpertSeq2Seq:
    return LipExpertSeq2Seq(embed_dim=embed_dim, enc_layers=enc_layers,
                            dec_layers=dec_layers, num_heads=num_heads,
                            stem_base=stem_base, max_text_len=max_text_len)


def create_state(
    key: jax.Array,
    syncnet_T: int = 5,
    learning_rate: float = 1e-4,
    max_text_len: int = 48,
    **model_sizes,
) -> LipExpertTrainState:
    model = default_expert(max_text_len, **model_sizes)
    video = jnp.zeros((1, syncnet_T, 88, 88, 1))
    tokens = jnp.zeros((1, max_text_len), jnp.int32)
    params = model.init(key, video, tokens)["params"]
    tx = optax.adam(learning_rate)
    return LipExpertTrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
        tx=tx, model=model,
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def train_step(
    state: LipExpertTrainState,
    batch: Dict[str, jax.Array],   # window (B,T,H,W,3) uint8, text_tokens (B,L)
    key: jax.Array,
) -> Tuple[LipExpertTrainState, Dict[str, jax.Array]]:
    model = state.model
    drop_key = jax.random.fold_in(key, state.step)

    def loss_fn(params):
        # token dropout (see seq2seq_expert_loss): pretraining must force
        # the decoder through cross-attention or it converges to the
        # unconditional char-LM and the expert never reads lips
        return seq2seq_expert_loss(
            model, params, batch["window"].astype(jnp.float32),
            batch["text_tokens"], token_dropout_key=drop_key,
        )

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1, params=new_params, opt_state=new_opt
    )
    return new_state, {"loss": loss}


def load_params(path: str, syncnet_T: int = 5, key=None, max_text_len: int = 48,
                **model_sizes):
    """Load a ``train-lip-expert --out`` export for use as the GAN's frozen
    lipreading expert (the reference's AV-HuBERT checkpoint role,
    train_lipreading.py:130-133)."""
    from ..core.checkpoint import load_once

    state = create_state(jax.random.key(0) if key is None else key,
                         syncnet_T=syncnet_T, max_text_len=max_text_len,
                         **model_sizes)
    return load_once(path, {"lip_expert": state.params})["lip_expert"]
