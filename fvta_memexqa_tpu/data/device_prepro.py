"""Device-side preprocessing: id batches + HBM-resident shared tables → model inputs.

This is the TPU-native replacement for the reference's host-side feed_dict assembly
(SURVEY.md section 3.2: Python batch gen + padding feeding `sess.run`). The shared
tables (photo-feature matrix, per-album modality tensors, GloVe matrix) are uploaded
to HBM once; per step only a few KB of int32 ids cross the host-device boundary, and
the full [N, A, P, F] photo-feature batch plus all text tensors materialize on device
via fused XLA gathers — BASELINE.json north star: "fused device-side preprocessing
stage feeding HBM-resident batches".
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from fvta_memexqa_tpu.data.pack import PackedShared
from fvta_memexqa_tpu.data.pipeline import Batch


@flax.struct.dataclass
class SharedTables:
    """HBM-resident dedup tables (device mirror of pack.py's PackedShared)."""

    word_emb: jnp.ndarray           # f32 [V, D]; frozen rows handled by models/embed.py
    vocab_chars: jnp.ndarray        # i32 [V, W] char ids per vocab word
    photo_feats: jnp.ndarray        # f32 [num_photos+1, F]
    album_photo_idx: jnp.ndarray    # i32 [num_albums+1, P]
    album_photo_mask: jnp.ndarray   # bool [num_albums+1, P]
    photo_title_words: jnp.ndarray  # i32 [num_albums+1, P, Ts]
    photo_title_chars: jnp.ndarray  # i32 [num_albums+1, P, Ts, W]
    photo_title_mask: jnp.ndarray   # bool [num_albums+1, P, Ts]
    album_text_words: jnp.ndarray   # i32 [num_albums+1, 4, Tt]
    album_text_chars: jnp.ndarray   # i32 [num_albums+1, 4, Tt, W]
    album_text_mask: jnp.ndarray    # bool [num_albums+1, 4, Tt]

    @classmethod
    def from_packed(cls, shared: PackedShared) -> "SharedTables":
        return cls(
            word_emb=jnp.asarray(shared.word_emb_init),
            vocab_chars=jnp.asarray(shared.vocab_chars),
            photo_feats=jnp.asarray(shared.photo_feats),
            album_photo_idx=jnp.asarray(shared.album_photo_idx),
            album_photo_mask=jnp.asarray(shared.album_photo_mask),
            photo_title_words=jnp.asarray(shared.photo_title_words),
            photo_title_chars=jnp.asarray(shared.photo_title_chars),
            photo_title_mask=jnp.asarray(shared.photo_title_mask),
            album_text_words=jnp.asarray(shared.album_text_words),
            album_text_chars=jnp.asarray(shared.album_text_chars),
            album_text_mask=jnp.asarray(shared.album_text_mask),
        )


@flax.struct.dataclass
class ModelInputs:
    """Fully materialized, fixed-shape model inputs (one QA batch).

    photo_feats carries RAW features [N, A, P, F] by default; with
    photo_projected=True it instead carries already-projected encoder inputs
    [N, A, P, d_emb] gathered from a per-checkpoint photo table (frozen-param
    evaluation fast path, see train.make_photo_table) — the model then skips
    its photo_proj Dense."""

    q_words: jnp.ndarray            # i32 [N, Jq]
    q_chars: jnp.ndarray            # i32 [N, Jq, W]
    q_mask: jnp.ndarray             # bool [N, Jq]
    choice_words: jnp.ndarray       # i32 [N, 4, Ja]
    choice_chars: jnp.ndarray       # i32 [N, 4, Ja, W]
    choice_mask: jnp.ndarray        # bool [N, 4, Ja]
    photo_feats: jnp.ndarray        # f32 [N, A, P, F] (or [N, A, P, d_emb], see above)
    photo_mask: jnp.ndarray         # bool [N, A, P]
    photo_title_words: jnp.ndarray  # i32 [N, A, P, Ts]
    photo_title_chars: jnp.ndarray  # i32 [N, A, P, Ts, W]
    photo_title_mask: jnp.ndarray   # bool [N, A, P, Ts]
    album_text_words: jnp.ndarray   # i32 [N, A, 4, Tt]
    album_text_chars: jnp.ndarray   # i32 [N, A, 4, Tt, W]
    album_text_mask: jnp.ndarray    # bool [N, A, 4, Tt]
    album_mask: jnp.ndarray         # bool [N, A]
    label: jnp.ndarray              # i32 [N]
    ex_mask: jnp.ndarray            # bool [N]
    photo_projected: bool = flax.struct.field(pytree_node=False, default=False)


def assemble(shared: SharedTables, batch: Batch,
             photo_table: jnp.ndarray | None = None) -> ModelInputs:
    """Pure gather; always called under jit as part of the train/eval step.

    photo_table: optional album-major pre-projected photo features
    [num_albums+1, P, d_emb] (train.make_photo_table). When given, the batch's
    photo inputs come from ONE contiguous-row gather per album instead of
    A*P random 10KB rows from the raw [num_photos, F] table, and the model's
    per-step 2537→d_emb projection is skipped (frozen-param consumers only —
    the table bakes in photo_proj params)."""
    a_idx = batch.album_idx                          # [N, A]
    amask = batch.album_mask[..., None]              # [N, A, 1]
    if photo_table is not None:
        pf = photo_table[a_idx]                      # [N, A, P, d_emb]
    else:
        photo_idx = shared.album_photo_idx[a_idx]    # [N, A, P]
        pf = shared.photo_feats[photo_idx]           # [N, A, P, F]
    return ModelInputs(
        q_words=batch.q_words,
        q_chars=batch.q_chars,
        q_mask=batch.q_mask,
        choice_words=batch.choice_words,
        choice_chars=batch.choice_chars,
        choice_mask=batch.choice_mask,
        photo_feats=pf,
        photo_projected=photo_table is not None,
        photo_mask=shared.album_photo_mask[a_idx] & amask,
        photo_title_words=shared.photo_title_words[a_idx],
        photo_title_chars=shared.photo_title_chars[a_idx],
        photo_title_mask=shared.photo_title_mask[a_idx] & amask[..., None],
        album_text_words=shared.album_text_words[a_idx],
        album_text_chars=shared.album_text_chars[a_idx],
        album_text_mask=shared.album_text_mask[a_idx] & amask[..., None],
        album_mask=batch.album_mask,
        label=batch.label,
        ex_mask=batch.ex_mask,
    )


def assemble_albums(d, shared: SharedTables, album_ids: jnp.ndarray,
                    photo_table: jnp.ndarray | None = None) -> ModelInputs:
    """Album-only inputs for a 1-album-per-row encode: ids [U] → ModelInputs
    with N=U, A=1. The ONE definition of album-only encode inputs, shared by
    the eval cache (eval_cache._encode_album_jit), serving pack ingestion, and
    the train-time album-dedup step (train.dedup_loss_and_metrics). Query-side
    fields are zeros of the configured shapes (d: DataConfig) — encode_context
    never reads them, so XLA dead-code-eliminates them from the step."""
    a_idx = album_ids[:, None]                       # [U, 1]
    amask = (a_idx > 0)[..., None]                   # [U, 1, 1]
    u = album_ids.shape[0]
    zi = lambda *s: jnp.zeros(s, jnp.int32)
    zb = lambda *s: jnp.zeros(s, bool)
    if photo_table is not None:
        pf = photo_table[a_idx]
    else:
        pf = shared.photo_feats[shared.album_photo_idx[a_idx]]
    return ModelInputs(
        q_words=zi(u, d.max_question_len),
        q_chars=zi(u, d.max_question_len, d.max_word_len),
        q_mask=zb(u, d.max_question_len),
        choice_words=zi(u, 4, d.max_answer_len),
        choice_chars=zi(u, 4, d.max_answer_len, d.max_word_len),
        choice_mask=zb(u, 4, d.max_answer_len),
        photo_feats=pf,
        photo_projected=photo_table is not None,
        photo_mask=shared.album_photo_mask[a_idx] & amask,
        photo_title_words=shared.photo_title_words[a_idx],
        photo_title_chars=shared.photo_title_chars[a_idx],
        photo_title_mask=shared.photo_title_mask[a_idx] & amask[..., None],
        album_text_words=shared.album_text_words[a_idx],
        album_text_chars=shared.album_text_chars[a_idx],
        album_text_mask=shared.album_text_mask[a_idx] & amask[..., None],
        album_mask=(a_idx > 0),
        label=zi(u),
        ex_mask=(album_ids > 0),
    )


def device_put_batch(batch: Batch) -> Batch:
    """Host→device transfer of the (small) id batch."""
    return jax.tree.map(jnp.asarray, batch)
