"""Word + char embedding: frozen-GloVe/trainable-OOV word table, char-CNN, highway.

Rebuild of the reference's embedding section (SURVEY.md section 2 "Word+char
embedding"): fixed GloVe vectors + trainable OOV/UNK rows, concatenated with a
trainable char-CNN (char embeddings → 1-D conv → ReLU → max-pool over word length),
then a highway network (BiDAF lineage; flag-gated).

Frozen/trainable split: the full GloVe-initialized table lives in the HBM-resident
SharedTables (uploaded once, never in the optimizer state); only the small
[1 + num_OOV, D] table is a parameter. Id layout is defined in data/vocab.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fvta_memexqa_tpu.data.tokenize import NUM_SPECIAL, UNK_ID


class WordEmbed(nn.Module):
    num_glove: int       # frozen rows occupy ids [NUM_SPECIAL, NUM_SPECIAL + num_glove)
    vocab_size: int
    dim: int

    @nn.compact
    def __call__(self, ids: jnp.ndarray, frozen_table: jnp.ndarray) -> jnp.ndarray:
        """ids [...], frozen_table f32 [V, D] (from SharedTables) → [..., D].

        Ids >= vocab_size are EXTENDED ids: eval-time OOV words the packer assigned
        rows past the trainable vocab (data/pack.py "extended lexicon"). Their word
        embedding is the UNK row — exactly what the per-token path produces for an
        OOV word — while their chars stay real, so the char-CNN keeps its OOV
        signal on val/test text.
        """
        ids = jnp.where(ids >= self.vocab_size, UNK_ID, ids)
        boundary = NUM_SPECIAL + self.num_glove
        num_trainable = max(self.vocab_size - boundary + 1, 1)  # UNK + OOV rows
        trainable = self.param(
            "oov_emb", nn.initializers.normal(0.1), (num_trainable, self.dim)
        )
        is_trainable = (ids == UNK_ID) | (ids >= boundary)
        t_id = jnp.clip(jnp.where(ids == UNK_ID, 0, ids - boundary + 1), 0, num_trainable - 1)
        f_id = jnp.clip(ids, 0, boundary - 1)
        return jnp.where(is_trainable[..., None], trainable[t_id], frozen_table[f_id])

    def full_table(self, frozen_table: jnp.ndarray, num_rows: int | None = None) -> jnp.ndarray:
        """Materialize the complete [num_rows, D] table (frozen GloVe + trainable
        rows; rows >= vocab_size resolve to the UNK row — extended-lexicon words).

        Used by the per-vocab embed-table path: all token-embedding compute
        (char-CNN, highway) runs once over the vocab rows instead of once per
        token occurrence — identical math, since it depends only on word identity.
        """
        ids = jnp.arange(num_rows if num_rows is not None else self.vocab_size)
        return self(ids, frozen_table)


class CharCNN(nn.Module):
    """Char embeddings → width-K 1-D conv (VALID) → ReLU → max-pool over word length.

    TPU-first formulation: the char-id gather runs as a one-hot matmul (gathers
    from a 70-row table are lane-inefficient on TPU; one-hot matmuls are ~2x
    faster at this scale) and the conv as im2col + one MXU matmul — measured
    0.197ms vs 0.372ms for lax.conv at vocab-table scale, identical math.
    """

    char_vocab_size: int
    emb_dim: int
    num_filters: int
    width: int

    @nn.compact
    def __call__(self, char_ids: jnp.ndarray) -> jnp.ndarray:
        """char_ids i32 [..., W] → [..., num_filters]."""
        emb_tbl = self.param(
            "char_emb",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal", out_axis=0),
            (self.char_vocab_size, self.emb_dim),
        )
        kernel = self.param(
            "conv_kernel", nn.initializers.lecun_normal(),
            (self.width * self.emb_dim, self.num_filters),
        )
        bias = self.param("conv_bias", nn.initializers.zeros, (self.num_filters,))
        lead = char_ids.shape[:-1]
        w = char_ids.shape[-1]
        flat = char_ids.reshape(-1, w)
        if jax.default_backend() == "tpu":
            # one-hot matmul beats the gather on TPU (small-table gathers are
            # lane-inefficient); on CPU the gather wins — dispatch per backend,
            # same math either way (row selection).
            oh = jax.nn.one_hot(flat, self.char_vocab_size, dtype=emb_tbl.dtype)
            emb = jnp.dot(oh.reshape(-1, self.char_vocab_size), emb_tbl,
                          preferred_element_type=jnp.float32
                          ).reshape(-1, w, self.emb_dim)
        else:
            emb = emb_tbl[flat]
        n_pos = w - self.width + 1
        wins = jnp.concatenate(
            [emb[:, i : n_pos + i, :] for i in range(self.width)], axis=-1
        )  # [B, n_pos, width*E]
        conv = jnp.dot(wins.reshape(-1, self.width * self.emb_dim), kernel,
                       preferred_element_type=jnp.float32)
        conv = conv.reshape(-1, n_pos, self.num_filters) + bias
        pooled = jnp.max(nn.relu(conv), axis=1)
        return pooled.reshape(lead + (self.num_filters,))


class Highway(nn.Module):
    """num_layers of y = g * relu(W_h x) + (1 - g) * x, g = sigmoid(W_t x)."""

    num_layers: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        for i in range(self.num_layers):
            h = nn.relu(nn.Dense(d, name=f"h{i}")(x))
            g = nn.sigmoid(nn.Dense(d, name=f"g{i}")(x))
            x = g * h + (1.0 - g) * x
        return x
