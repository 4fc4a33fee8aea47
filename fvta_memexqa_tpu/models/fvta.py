"""The FVTA MemexQA model: embed → per-modality encoders → focal attention → scorer.

Rebuild of the reference's `model.py` graph (SURVEY.md sections 2 and 3.4) as a Flax
module over fixed-shape ModelInputs. Wiring (canonical for this rebuild; mount empty):

- word-level: GloVe+charCNN(+highway) embeddings; ONE shared word bi-LSTM encodes the
  question (per-word states), each answer candidate (summary state), and each photo
  title (summary state). Sharing the word encoder across question/answer/title text is
  the BiDAF-lineage choice; per-modality *time* encoders below are separate, matching
  the reference's "one bi-LSTM per context modality".
- time-level, per album: 6 modality sequences (config.MODALITIES order) —
    photo        : projected photo features over photos      [A, P,  2H]
    photo_title  : per-photo title summaries over photos     [A, P,  2H]
    album_title / album_desc / when / where
                 : word embeddings over words                [A, Tt, 2H]
  each encoded by its own bi-LSTM, padded to common T and stacked into the context
  tensor H [N, S=A*6, T, 2H] with mask [N, S, T].
- FVTA core: correlation tensor + hierarchical focal softmax (ops/fvta_ref.py, or the
  fused Pallas kernel when cfg.model.use_pallas).
- scorer: logits_i = Dense([ctx; q~; a_i; ctx*a_i; q~*a_i]) for the 4 candidates,
  evaluated as one batched matmul (BASELINE.json north star).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax.numpy as jnp

from fvta_memexqa_tpu.config import Config, MODALITIES
from fvta_memexqa_tpu.data.device_prepro import ModelInputs, SharedTables
from fvta_memexqa_tpu.models.embed import CharCNN, Highway, WordEmbed
from fvta_memexqa_tpu.ops.fvta_ref import ATTENTION_VARIANTS, AttentionOutput, similarity_tensor
from fvta_memexqa_tpu.ops.lstm_ref import bilstm_ref, init_lstm_params


class ModelOutput(NamedTuple):
    logits: jnp.ndarray        # [N, 4]
    attention: AttentionOutput


class BiLSTM(nn.Module):
    """Bidirectional LSTM with TF1 numerics; Pallas fused scan behind a flag.

    fin_only=True is a contract promise that the caller consumes ONLY the final
    state: the fused path then runs the no-output-writes kernel
    (ops/lstm_fused.bilstm_fused_final) and returns (None, fin). in_dim is the
    static input feature width (params are created in setup so sibling encoders
    can be batched into one grouped kernel launch via .pair()).

    dtype="bfloat16" selects the bf16-ACTIVATION variant (ModelConfig.dtype):
    the scan's x-projection, carried state, and transcendentals run in bf16
    (f32 matmul accumulation — ops/lstm_ref.lstm_scan_ref), outputs cast back
    to f32 at this module boundary so attention/scorer numerics are untouched.
    It routes through the XLA scan even under use_pallas: the fused kernels
    pin f32 state for golden bit-parity, and bf16 explicitly trades that
    parity for speed (BASELINE.md "bf16 activation variant")."""

    in_dim: int
    hidden_dim: int
    forget_bias: float = 1.0
    use_pallas: bool = False
    dtype: str = "float32"

    def setup(self):
        self.p_fw = self.param(
            "fw", lambda k: init_lstm_params(k, self.in_dim, self.hidden_dim))
        self.p_bw = self.param(
            "bw", lambda k: init_lstm_params(k, self.in_dim, self.hidden_dim))

    def pair(self):
        """Raw (fw, bw) params, for grouped multi-encoder launches."""
        return self.p_fw, self.p_bw

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, fin_only: bool = False):
        if self.dtype == "bfloat16":
            out, fin = bilstm_ref(self.p_fw, self.p_bw, x, mask,
                                  self.forget_bias, dtype=jnp.bfloat16)
            fin = fin.astype(jnp.float32)
            return (None, fin) if fin_only else (out.astype(jnp.float32), fin)
        if self.use_pallas:
            from fvta_memexqa_tpu.ops.lstm_fused import bilstm_fused, bilstm_fused_final

            if fin_only:
                return None, bilstm_fused_final(self.p_fw, self.p_bw, x, mask,
                                                self.forget_bias)
            return bilstm_fused(self.p_fw, self.p_bw, x, mask, self.forget_bias)
        out, fin = bilstm_ref(self.p_fw, self.p_bw, x, mask, self.forget_bias)
        return (None, fin) if fin_only else (out, fin)


class FVTAModel(nn.Module):
    cfg: Config

    def setup(self):
        d = self.cfg.data
        m = self.cfg.model
        self.word_embed = WordEmbed(
            num_glove=d.num_glove_words, vocab_size=d.word_vocab_size, dim=d.word_emb_dim
        )
        self.char_cnn = CharCNN(
            char_vocab_size=max(d.char_vocab_size, 4),
            emb_dim=m.char_emb_dim,
            num_filters=m.char_cnn_filters,
            width=m.char_cnn_width,
        )
        self.highway = Highway(num_layers=2)
        self.dropout = nn.Dropout(rate=1.0 - m.keep_prob)
        self.photo_proj = nn.Dense(d.word_emb_dim + m.char_cnn_filters, name="photo_proj")
        kw = dict(hidden_dim=m.hidden_dim, forget_bias=m.forget_bias,
                  use_pallas=m.use_pallas, dtype=m.dtype)
        demb = d.word_emb_dim + m.char_cnn_filters
        self.enc_word = BiLSTM(name="enc_word", in_dim=demb, **kw)
        # photo/photo_title/album-text time encoders; photo_title consumes the
        # word-level summary states, hence in_dim = 2H
        self.enc_time = [
            BiLSTM(name=f"enc_{mod}",
                   in_dim=(2 * m.hidden_dim if mod == "photo_title" else demb), **kw)
            for mod in MODALITIES
        ]
        if m.similarity == "trilinear":
            h2 = 2 * m.hidden_dim
            self.w_x = self.param("sim_w_x", nn.initializers.normal(0.1), (h2,))
            self.w_y = self.param("sim_w_y", nn.initializers.normal(0.1), (h2,))
            self.w_xy = self.param("sim_w_xy", nn.initializers.normal(0.1), (h2,))
        elif m.similarity == "bilinear":
            h2 = 2 * m.hidden_dim
            self.w_bilinear = self.param(
                "sim_w_bilinear", nn.initializers.lecun_normal(), (h2, h2)
            )
        self.scorer = nn.Dense(1, name="scorer")

    # ---- building blocks -----------------------------------------------------

    def _vocab_table(self, shared: SharedTables) -> jnp.ndarray:
        """[V_ext, d_in] full token-embedding table: word emb + char-CNN + highway
        computed once over the vocab (cfg.model.vocab_embed fast path).

        Rows >= word_vocab_size are the packer's extended-lexicon rows (eval-time
        OOV words): UNK word embedding + the word's REAL chars, bit-identical to
        what the per-token path computes for those tokens."""
        w = self.word_embed.full_table(shared.word_emb, shared.vocab_chars.shape[0])
        c = self.char_cnn(shared.vocab_chars)
        return self.highway(jnp.concatenate([w, c], axis=-1))

    def _photo_table(self, shared: SharedTables) -> jnp.ndarray:
        """[num_albums+1, P, d_emb] album-major pre-projected photo features:
        photo_proj applied once over the whole photo table, then gathered into
        album-major layout. Pure function of (params, shared) — frozen-param
        consumers precompute it per checkpoint (train.make_photo_table) and
        assemble() gathers per-batch rows from it, replacing the per-step
        [N,A,P,2537] raw gather + 2537→d_emb matmul (~10% of forward FLOPs)
        with one small contiguous gather. Same math as the inline path
        (gather commutes with the per-row Dense); parity-tested."""
        proj = self.photo_proj(shared.photo_feats)        # [num_photos+1, d_emb]
        return proj[shared.album_photo_idx]               # [num_albums+1, P, d_emb]

    def _embed_text(self, words, chars, frozen_table, train: bool, vocab_table=None):
        """word ids [..., L] + char ids [..., L, W] → [..., L, d_in].

        With a vocab_table, the per-token compute collapses to one gather; dropout
        stays per token position either way (matching the per-token path)."""
        if vocab_table is not None:
            x = vocab_table[words]
        else:
            w = self.word_embed(words, frozen_table)
            c = self.char_cnn(chars)
            x = self.highway(jnp.concatenate([w, c], axis=-1))
        return self.dropout(x, deterministic=not train)

    def _encode_words(self, enc, x, mask, fin_only: bool = False):
        """Flatten leading dims, run a word-level bi-LSTM, restore leading dims."""
        lead = x.shape[:-2]
        out, fin = enc(x.reshape((-1,) + x.shape[-2:]),
                       mask.reshape((-1, mask.shape[-1])), fin_only=fin_only)
        return (out.reshape(lead + out.shape[1:]) if out is not None else None,
                fin.reshape(lead + fin.shape[1:]))

    # ---- forward -------------------------------------------------------------

    def encode_context(self, shared: SharedTables, mi: ModelInputs,
                       train: bool = False,
                       vocab_table: jnp.ndarray | None = None
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Album-side encode: ModelInputs → (H_ctx [N, S, T, 2H], ctx_mask [N, S, T]).

        Split out from __call__ so serving (serve.py) can run it ONCE per album and
        cache the result in HBM — queries then skip the expensive context encoders
        entirely (streaming album ingestion, BASELINE.json config 5).
        """
        d, m = self.cfg.data, self.cfg.model
        ft = shared.word_emb
        n = mi.q_words.shape[0]
        h2 = 2 * m.hidden_dim
        # The vocab embed table is a pure function of (params, shared): frozen-
        # param consumers (evaluation, serving) precompute it ONCE per checkpoint
        # and pass it in — ~22% of a bs=64 step saved, identical logits (tested).
        vt = vocab_table
        if vt is None and m.vocab_embed:
            vt = self._vocab_table(shared)

        # Photo titles: per-photo summary [N, A, P, 2H] (final states only)
        pt_emb = self._embed_text(mi.photo_title_words, mi.photo_title_chars, ft, train, vt)
        _, pt_sum = self._encode_words(self.enc_word, pt_emb, mi.photo_title_mask,
                                       fin_only=True)

        # ---- per-modality time encoders (context tensor assembly) ----
        A, P = d.max_albums, d.max_photos
        t_ctx = d.max_context_time

        def pad_t(x, mask):
            """Pad the time axis of [N*A, t, 2H] / [N*A, t] out to t_ctx."""
            pad = t_ctx - x.shape[1]
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, pad)))
            return x, mask

        # One (x, mask) per modality, MODALITIES order; all share batch n*A.
        # photo_projected: assemble() already gathered pre-projected rows from
        # the per-checkpoint photo table — skip the (baked-in) projection.
        pf = mi.photo_feats if mi.photo_projected else self.photo_proj(mi.photo_feats)
        photo_in = self.dropout(pf, deterministic=not train)
        at_emb = self._embed_text(mi.album_text_words, mi.album_text_chars, ft, train, vt)
        enc_in = [
            (photo_in.reshape(n * A, P, -1), mi.photo_mask.reshape(n * A, P)),
            (pt_sum.reshape(n * A, P, h2),
             mi.photo_title_mask.any(axis=-1).reshape(n * A, P)),
        ]
        for fi in range(4):  # album_title, album_desc, when, where
            enc_in.append((
                at_emb[:, :, fi].reshape(n * A, d.max_album_text_len, -1),
                mi.album_text_mask[:, :, fi].reshape(n * A, d.max_album_text_len),
            ))

        # Per-encoder launches, fused (ops/lstm_fused) or XLA per cfg.use_pallas.
        # Measured and deliberately NOT the grouped one-launch variant
        # (bilstm_fused_grouped): at flagship shapes each modality's batch is
        # only N*A rows, so the grouped grid degenerates to tiny cells and loses
        # to per-encoder launches — see BASELINE.md "Fused LSTM v2".
        outs = [self.enc_time[k](x, mk)[0] for k, (x, mk) in enumerate(enc_in)]

        seqs, masks = [], []
        for out, (_, mk) in zip(outs, enc_in):
            x_p, m_p = pad_t(out, mk)
            seqs.append(x_p)
            masks.append(m_p)

        # [N*A, 6, T, 2H] → [N, A*6, T, 2H] (sequence axis S groups album-major)
        h_ctx = jnp.stack(seqs, axis=1).reshape(n, A * len(MODALITIES), t_ctx, h2)
        ctx_mask = jnp.stack(masks, axis=1).reshape(n, A * len(MODALITIES), t_ctx)
        return h_ctx, ctx_mask

    def answer(self, shared: SharedTables, mi: ModelInputs, h_ctx: jnp.ndarray,
               ctx_mask: jnp.ndarray, train: bool = False,
               cp_attention=None,
               vocab_table: jnp.ndarray | None = None) -> ModelOutput:
        """Query-side: question/choice encode + FVTA attention over (possibly
        cached) context states + 4-way scorer.

        cp_attention: optional shard_map-wrapped context-parallel attention
        (parallel/cp.make_cp_attention) for configs whose context time axis is
        sharded over the mesh's "ctx" axis — numerically identical to the local
        path (tested at MemexQA scale in tests/test_parallel.py)."""
        d, m = self.cfg.data, self.cfg.model
        ft = shared.word_emb
        vt = vocab_table
        if vt is None and m.vocab_embed:
            vt = self._vocab_table(shared)

        # Question: per-word hidden states [N, J, 2H]
        q_emb = self._embed_text(mi.q_words, mi.q_chars, ft, train, vt)
        h_q, _ = self.enc_word(q_emb, mi.q_mask)

        # Choices: summary states [N, 4, 2H] (final states only)
        a_emb = self._embed_text(mi.choice_words, mi.choice_chars, ft, train, vt)
        _, a_sum = self._encode_words(self.enc_word, a_emb, mi.choice_mask,
                                      fin_only=True)

        # ---- FVTA core ----
        sim_params = {}
        if m.similarity == "trilinear":
            sim_params = {"w_x": self.w_x, "w_y": self.w_y, "w_xy": self.w_xy}
        elif m.similarity == "bilinear":
            sim_params = {"w_bilinear": self.w_bilinear}

        if cp_attention is not None:
            attn = cp_attention(h_ctx, ctx_mask, h_q, mi.q_mask, sim_params)
        elif m.pallas_attention and m.attention == "fvta":
            from fvta_memexqa_tpu.ops.fvta_pallas import fvta_attention_pallas

            attn = fvta_attention_pallas(
                h_ctx, ctx_mask, h_q, mi.q_mask, m.similarity, sim_params
            )
        else:
            corr = similarity_tensor(h_ctx, h_q, m.similarity, sim_params)
            attn = ATTENTION_VARIANTS[m.attention](h_ctx, ctx_mask, h_q, mi.q_mask, corr)

        # ---- 4-way scorer: one batched matmul over all candidates ----
        ctx = attn.context[:, None, :]      # [N, 1, 2H]
        qv = attn.question[:, None, :]      # [N, 1, 2H]
        feats = jnp.concatenate(
            [
                jnp.broadcast_to(ctx, a_sum.shape),
                jnp.broadcast_to(qv, a_sum.shape),
                a_sum,
                ctx * a_sum,
                qv * a_sum,
            ],
            axis=-1,
        )                                    # [N, 4, 5*2H]
        logits = self.scorer(feats)[..., 0]  # [N, 4]
        return ModelOutput(logits=logits, attention=attn)

    def __call__(self, shared: SharedTables, mi: ModelInputs,
                 train: bool = False, cp_attention=None,
                 vocab_table: jnp.ndarray | None = None) -> ModelOutput:
        if vocab_table is None and self.cfg.model.vocab_embed:
            vocab_table = self._vocab_table(shared)  # share across both halves
        h_ctx, ctx_mask = self.encode_context(shared, mi, train, vocab_table)
        return self.answer(shared, mi, h_ctx, ctx_mask, train, cp_attention,
                           vocab_table)
