"""TGIF-QA-style video QA: FVTA over long frame-feature sequences.

BASELINE.json config 4: "TGIF-QA-style video QA: FVTA over frame-feature sequences
(long-sequence temporal attention path)". The FVTA paper generalizes focal attention
to video QA (SURVEY.md section 6); the real TGIF-QA assets are not in the sandbox, so
this path is provable on synthetic frame features and pluggable for real ones.

TPU-first design decisions (documented per SURVEY.md section 5):
- Context = a single frame sequence → S=1 and the hierarchical focal softmax
  degenerates to its time level; the same attention code paths (ref / fused Pallas /
  context-parallel) are reused unchanged.
- Temporal encoder choices: "bilstm" (paper-faithful; sequential, single-device) or
  "dilated_conv" (stack of dilated temporal convs — parallel over T, so the encoder
  itself shards over the ctx axis; the TPU-native choice for T in the thousands).
- Long T: attention via parallel/cp.py over the ("ctx") mesh axis; HBM traffic is
  linear in T on every path.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from fvta_memexqa_tpu.config import Config
from fvta_memexqa_tpu.data.device_prepro import SharedTables
from fvta_memexqa_tpu.models.embed import CharCNN, Highway, WordEmbed
from fvta_memexqa_tpu.models.fvta import BiLSTM
from fvta_memexqa_tpu.ops.fvta_ref import ATTENTION_VARIANTS, AttentionOutput, similarity_tensor


@flax.struct.dataclass
class VideoInputs:
    frame_feats: jnp.ndarray   # f32 [N, T, F]
    frame_mask: jnp.ndarray    # bool [N, T]
    q_words: jnp.ndarray       # i32 [N, Jq]
    q_chars: jnp.ndarray       # i32 [N, Jq, W]
    q_mask: jnp.ndarray        # bool [N, Jq]
    choice_words: jnp.ndarray  # i32 [N, C, Ja]
    choice_chars: jnp.ndarray  # i32 [N, C, Ja, W]
    choice_mask: jnp.ndarray   # bool [N, C, Ja]
    label: jnp.ndarray         # i32 [N]
    ex_mask: jnp.ndarray       # bool [N]


class VideoOutput(NamedTuple):
    logits: jnp.ndarray        # [N, C]
    attention: AttentionOutput


class DilatedConvEncoder(nn.Module):
    """Parallel-over-T temporal encoder: stacked dilated convs with residuals.
    Receptive field grows exponentially; output dim 2H to match the bi-LSTM.

    dtype="bfloat16" runs the conv stack (the long-T bandwidth hot spot:
    activations are [N, T, 2H] per layer) with bf16 activations — flax's
    computation dtype, params stay f32 — and casts back to f32 at the module
    boundary. The mean-pooled summary accumulates in f32 either way."""

    hidden_dim: int
    num_layers: int = 4
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray):
        h2 = 2 * self.hidden_dim
        cdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        x = x.astype(cdt)
        m = mask[..., None].astype(x.dtype)
        x = nn.Dense(h2, name="in_proj", dtype=cdt)(x) * m
        for li in range(self.num_layers):
            y = nn.Conv(h2, kernel_size=(3,), kernel_dilation=(2 ** li),
                        padding="SAME", name=f"conv{li}", dtype=cdt)(x * m)
            x = x + nn.gelu(y) * m
        xf = (x * m).astype(jnp.float32)
        fin = jnp.sum(xf, axis=1) / jnp.maximum(
            m.astype(jnp.float32).sum(axis=1), 1.0)
        return xf, fin


class VideoFVTAModel(nn.Module):
    """Question vs a frame sequence, scored FVTA-style, with the TGIF-QA task
    heads (SURVEY.md §6: the FVTA paper's video generalization evaluates on
    TGIF-QA's four tasks; BASELINE.json config 4):

    - task="mc"      Action / Transition: C-way multiple choice — each encoded
                     candidate is scored against the attended (context,
                     question) summary; logits [N, C].
    - task="count"   Repetition Count: scalar regression (TGIF-QA practice:
                     L2 loss, report MSE; predictions rounded+clipped to the
                     count range for exact-match accuracy); logits [N, 1].
    - task="frameqa" open-vocabulary answer → classification over the
                     answer vocabulary built at pack time (standard TGIF-QA
                     treatment); logits [N, num_answers]; out-of-vocabulary
                     ground truths carry label -1 and always count wrong.

    The frameqa head reads [ctx, q̃, ctx∘q̃, h̄, ctx∘h̄] where h̄ is the masked
    mean of the temporal encoder states — the global-content channel that the
    softmax-normalized attention context cannot carry. The count head is a
    question-conditioned per-frame soft detector summed over valid frames
    (design rationale measured + documented at the head itself, `answer()`).
    One batched Dense per head — no per-example loops, shapes static in T and
    the answer vocab."""

    cfg: Config
    num_choices: int = 5       # TGIF-QA multiple-choice tasks are 5-way
    temporal_encoder: str = "dilated_conv"  # dilated_conv | bilstm
    task: str = "mc"           # mc | count | frameqa
    num_answers: int = 0       # frameqa answer-vocab size

    def setup(self):
        d, m = self.cfg.data, self.cfg.model
        self.word_embed = WordEmbed(
            num_glove=d.num_glove_words, vocab_size=d.word_vocab_size, dim=d.word_emb_dim
        )
        self.char_cnn = CharCNN(
            char_vocab_size=max(d.char_vocab_size, 4), emb_dim=m.char_emb_dim,
            num_filters=m.char_cnn_filters, width=m.char_cnn_width,
        )
        self.highway = Highway(num_layers=2)
        self.dropout = nn.Dropout(rate=1.0 - m.keep_prob)
        demb = d.word_emb_dim + m.char_cnn_filters
        self.enc_word = BiLSTM(hidden_dim=m.hidden_dim, forget_bias=m.forget_bias,
                               use_pallas=m.use_pallas, in_dim=demb,
                               dtype=m.dtype, name="enc_word")
        if self.temporal_encoder == "bilstm":
            self.frame_proj = nn.Dense(demb, name="frame_proj")
            self.enc_frames = BiLSTM(hidden_dim=m.hidden_dim,
                                     forget_bias=m.forget_bias, in_dim=demb,
                                     use_pallas=m.use_pallas, dtype=m.dtype,
                                     name="enc_frames")
        else:
            self.enc_frames = DilatedConvEncoder(hidden_dim=m.hidden_dim,
                                                 dtype=m.dtype,
                                                 name="enc_frames")
        if m.similarity == "trilinear":
            h2 = 2 * m.hidden_dim
            self.w_x = self.param("sim_w_x", nn.initializers.normal(0.1), (h2,))
            self.w_y = self.param("sim_w_y", nn.initializers.normal(0.1), (h2,))
            self.w_xy = self.param("sim_w_xy", nn.initializers.normal(0.1), (h2,))
        elif m.similarity == "bilinear":
            h2 = 2 * m.hidden_dim
            self.w_bilinear = self.param(
                "sim_w_bilinear", nn.initializers.lecun_normal(), (h2, h2))
        if self.task == "mc":
            self.scorer = nn.Dense(1, name="scorer")
        elif self.task == "count":
            self.scorer = nn.Dense(1, name="count_head")
            self.count_frame = nn.Dense(1, name="count_frame")
            self.count_qproj = nn.Dense(self.cfg.data.image_feat_dim,
                                        name="count_qproj")
        elif self.task == "frameqa":
            if self.num_answers < 2:
                raise ValueError("task='frameqa' needs num_answers >= 2 "
                                 "(the pack-time answer vocabulary size)")
            self.scorer = nn.Dense(self.num_answers, name="frameqa_head")
        else:
            raise ValueError(f"unknown task {self.task!r} "
                             "(expected mc | count | frameqa)")

    def _vocab_table(self, shared: SharedTables) -> jnp.ndarray:
        """Full token-embedding table (same factorization as FVTAModel):
        computed ONCE per forward and shared between question/choice embeds,
        or precomputed per checkpoint by frozen-param consumers."""
        w = self.word_embed.full_table(shared.word_emb, shared.vocab_chars.shape[0])
        c = self.char_cnn(shared.vocab_chars)
        return self.highway(jnp.concatenate([w, c], axis=-1))

    def _embed_text(self, shared, words, chars, train, vocab_table=None):
        if vocab_table is not None:
            x = vocab_table[words]
        else:
            w = self.word_embed(words, shared.word_emb)
            c = self.char_cnn(chars)
            x = self.highway(jnp.concatenate([w, c], axis=-1))
        return self.dropout(x, deterministic=not train)

    def encode_frames(self, vi: VideoInputs, train: bool = False):
        """Frame sequence → context states [N, 1, T, 2H] + mask (S=1)."""
        if self.temporal_encoder == "bilstm":
            x = self.frame_proj(vi.frame_feats)
            x = self.dropout(x, deterministic=not train)
            out, _ = self.enc_frames(x, vi.frame_mask)
        else:
            out, _ = self.enc_frames(vi.frame_feats, vi.frame_mask)
        return out[:, None], vi.frame_mask[:, None]

    def answer(self, shared: SharedTables, vi: VideoInputs, h_ctx, ctx_mask,
               train: bool = False, cp_attention=None,
               vocab_table=None) -> VideoOutput:
        m = self.cfg.model
        vt = vocab_table
        if vt is None and m.vocab_embed:
            vt = self._vocab_table(shared)  # once; shared by question + choices
        q_emb = self._embed_text(shared, vi.q_words, vi.q_chars, train, vt)
        h_q, q_fin = self.enc_word(q_emb, vi.q_mask)
        if self.task == "mc":
            a_emb = self._embed_text(shared, vi.choice_words, vi.choice_chars,
                                     train, vt)
            n, c_num = a_emb.shape[:2]
            _, a_fin = self.enc_word(
                a_emb.reshape((n * c_num,) + a_emb.shape[2:]),
                vi.choice_mask.reshape(n * c_num, -1),
                fin_only=True,
            )
            a_sum = a_fin.reshape(n, c_num, -1)

        sim_params = {}
        if m.similarity == "trilinear":
            sim_params = {"w_x": self.w_x, "w_y": self.w_y, "w_xy": self.w_xy}
        elif m.similarity == "bilinear":
            sim_params = {"w_bilinear": self.w_bilinear}
        if cp_attention is not None:
            attn = cp_attention(h_ctx, ctx_mask, h_q, vi.q_mask, sim_params)
        elif m.pallas_attention and m.attention == "fvta":
            from fvta_memexqa_tpu.ops.fvta_pallas import fvta_attention_pallas

            attn = fvta_attention_pallas(h_ctx, ctx_mask, h_q, vi.q_mask,
                                         m.similarity, sim_params)
        else:
            corr = similarity_tensor(h_ctx, h_q, m.similarity, sim_params)
            attn = ATTENTION_VARIANTS[m.attention](h_ctx, ctx_mask, h_q, vi.q_mask, corr)

        if self.task == "mc":
            ctx = attn.context[:, None, :]
            qv = attn.question[:, None, :]
            feats = jnp.concatenate(
                [jnp.broadcast_to(ctx, a_sum.shape),
                 jnp.broadcast_to(qv, a_sum.shape),
                 a_sum, ctx * a_sum, qv * a_sum], axis=-1)
            logits = self.scorer(feats)[..., 0]
        else:
            # masked temporal mean of the encoder states: the magnitude
            # channel (count) / global-content channel (frameqa) that the
            # normalized attention context cannot carry
            m = ctx_mask.astype(h_ctx.dtype)[..., None]            # [N, S, T, 1]
            ctx, qv = attn.context, attn.question
            if self.task == "count":
                # soft counting: a question-conditioned per-frame detector,
                # summed over valid frames — counting is structurally a sum of
                # per-step indicators, which neither the softmax-normalized
                # attention context nor a temporal mean can represent with the
                # right extrapolation (one batched Dense over [N,S,T,4H]; no
                # scan, no dynamic shapes). Two measured design rules:
                # (1) detect on the RAW per-frame features, not the temporal
                # encoder's states — at video scale the encoder's receptive
                # field approaches the whole sequence (dilated convs: ~31
                # frames), so every state is a near-global mixture and a
                # per-frame detector on it cannot localize occurrences;
                # (2) condition on the PURE question encoding q_fin (bi-LSTM
                # final state), NOT the attended q̃, whose video-dependent
                # attention weights act as a per-example fingerprint — a
                # q̃-fed head memorizes train exactly while held-out MSE
                # lands at the predict-the-mean floor. q_fin varies only with
                # the question text, so the only video-dependent route into
                # the head is the summed per-frame detector itself.
                f = vi.frame_feats                                # [N, T, F]
                qp = self.count_qproj(q_fin)[:, None, :]          # [N, 1, F]
                u = jnp.concatenate([f, f * qp], axis=-1)
                s_t = self.count_frame(u)[..., 0]                  # [N, T]
                fm = vi.frame_mask.astype(s_t.dtype)
                softcnt = (jax.nn.sigmoid(s_t) * fm).sum(1)
                feats = [q_fin, softcnt[:, None]]
            else:
                hbar = (h_ctx * m).sum((1, 2)) / jnp.maximum(m.sum((1, 2)), 1.0)
                feats = [ctx, qv, ctx * qv, hbar, ctx * hbar]
            logits = self.scorer(jnp.concatenate(feats, axis=-1))
        return VideoOutput(logits=logits, attention=attn)

    def __call__(self, shared: SharedTables, vi: VideoInputs,
                 train: bool = False, cp_attention=None,
                 vocab_table=None) -> VideoOutput:
        h_ctx, ctx_mask = self.encode_frames(vi, train)
        return self.answer(shared, vi, h_ctx, ctx_mask, train, cp_attention,
                           vocab_table)


COUNT_MIN, COUNT_MAX = 1, 10  # TGIF-QA repetition-count answer range


def video_loss(model: VideoFVTAModel, params, shared, vi: VideoInputs, rng, train,
               cp_attention=None):
    """Task-dispatched loss/metrics (one jittable function per model.task —
    the branch is on a static module field, so each task compiles its own
    graph with no runtime cond):

    - mc:      masked softmax CE over choices; metric acc.
    - count:   masked L2 regression on the raw count (TGIF-QA practice);
               metrics mse + acc of the rounded, range-clipped prediction.
    - frameqa: masked CE over the answer vocabulary; ground truths outside
               the train-time vocab carry label -1 — zero loss weight, always
               scored wrong (they are unpredictable by construction).

    cp_attention: optional shard_map-wrapped context-parallel attention
    (parallel/cp.make_cp_attention) — trains long-T models with the frame axis
    sharded over the mesh's "ctx" axis (cli video --cp N)."""
    rngs = {"dropout": rng} if train else None
    out = model.apply(params, shared, vi, train=train, rngs=rngs,
                      cp_attention=cp_attention)
    w = vi.ex_mask.astype(jnp.float32)
    if model.task == "count":
        pred = out.logits[:, 0]
        err = pred - vi.label.astype(pred.dtype)
        loss = (err * err * w).sum() / jnp.maximum(w.sum(), 1.0)
        rounded = jnp.clip(jnp.round(pred), COUNT_MIN, COUNT_MAX).astype(jnp.int32)
        acc = (((rounded == vi.label) * w).sum() / jnp.maximum(w.sum(), 1.0))
        return loss, {"acc": acc, "mse": loss}
    if model.task == "frameqa":
        valid = (vi.label >= 0) & vi.ex_mask
        wv = valid.astype(jnp.float32)
        safe = jnp.maximum(vi.label, 0)
        logp = jax.nn.log_softmax(out.logits)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
        loss = (nll * wv).sum() / jnp.maximum(wv.sum(), 1.0)
        # OOV ground truths count WRONG in the denominator (w, not wv)
        acc = (((jnp.argmax(out.logits, -1) == vi.label) & valid) * w).sum() \
            / jnp.maximum(w.sum(), 1.0)
        return loss, {"acc": acc}
    logp = jax.nn.log_softmax(out.logits)
    nll = -jnp.take_along_axis(logp, vi.label[:, None], axis=1)[:, 0]
    loss = (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
    acc = (((jnp.argmax(out.logits, -1) == vi.label) * w).sum()
           / jnp.maximum(w.sum(), 1.0))
    return loss, {"acc": acc}


def make_synthetic_video(cfg: Config, num_videos: int = 32, num_frames: int = 64,
                         num_choices: int = 5, seed: int = 0, task: str = "mc"):
    """Deterministic synthetic video QA in the TGIF-QA task shapes:

    - task="mc": each video contains a dominant 'event' feature direction in a
      contiguous frame span; the question asks which event occurred;
      distractor choices name absent events. (Action/Transition stand-in.)
    - task="count": the asked event is planted in `label` disjoint fixed-width
      spans AND a different distractor event is planted with its own
      independent count — total event mass is uninformative, so the model
      must read the magnitude of the question's event, not "how busy is the
      video". Labels span [COUNT_MIN, count_max].
    - task="frameqa": one planted event; the label is the event's index in
      the EVENTS answer vocabulary (num_answers = len(EVENTS)); no choices.

    Returns (VideoInputs, vocab_words) sized to cfg.data's text shapes, with
    frame_feats [N, T, image_feat_dim]. The task questions share one word
    vocabulary so packs/models across tasks agree on word ids."""
    import numpy as np

    d = cfg.data
    rng = np.random.default_rng(seed)
    events = ["jump", "spin", "wave", "fall", "clap", "run", "nod", "point"]
    # event feature directions come from a FIXED generator, independent of `seed`:
    # different seeds must describe the same underlying visual world, or held-out
    # sets are unlearnable by construction
    dir_rng = np.random.default_rng(20260816)
    dirs = {e: dir_rng.normal(0, 1, d.image_feat_dim).astype(np.float32)
            for e in events}
    n = num_videos
    feats = 0.1 * rng.normal(0, 1, (n, num_frames, d.image_feat_dim)).astype(np.float32)
    labels = np.zeros(n, np.int32)
    # word ids: build a tiny fixed vocab mapping for the question/choice words
    words = (["what", "did", "the", "person", "do", "?", "how", "many", "times"]
             + events)
    w2i = {w: i + 2 for i, w in enumerate(words)}

    if task != "mc":
        num_choices = 1  # unused by the model; minimal static shapes
    q_words = np.zeros((n, d.max_question_len), np.int32)
    q_mask = np.zeros((n, d.max_question_len), bool)
    c_words = np.zeros((n, num_choices, d.max_answer_len), np.int32)
    c_mask = np.zeros((n, num_choices, d.max_answer_len), bool)
    span_w = 2
    count_max = min(COUNT_MAX, max(num_frames // (2 * span_w) - 1, COUNT_MIN + 1))

    for i in range(n):
        ev_idx = int(rng.integers(len(events)))
        ev = events[ev_idx]
        if task == "count":
            k = int(rng.integers(COUNT_MIN, count_max + 1))
            k2 = int(rng.integers(COUNT_MIN, count_max + 1))
            # disjoint slots for the asked event vs the distractor: an
            # overlapping frame would carry a normalized MIXTURE of both
            # directions — ambiguous for any per-frame detector
            slots = rng.permutation(num_frames // span_w)
            other = events[(ev_idx + 1 + int(rng.integers(len(events) - 1)))
                           % len(events)]
            for sl in slots[:k]:
                feats[i, sl * span_w : (sl + 1) * span_w] += dirs[ev]
            for sl in slots[k : k + k2]:
                feats[i, sl * span_w : (sl + 1) * span_w] += dirs[other]
            labels[i] = k
            q = ["how", "many", "times", "did", "the", "person", ev, "?"]
        else:
            start = int(rng.integers(0, max(num_frames // 2, 1)))
            span = int(rng.integers(2, max(num_frames // 2, 3)))
            feats[i, start : start + span] += dirs[ev]
            q = ["what", "did", "the", "person", "do", "?"]
        for j, w in enumerate(q[: d.max_question_len]):
            q_words[i, j] = w2i[w]
            q_mask[i, j] = True
        if task == "frameqa":
            labels[i] = ev_idx
        elif task == "mc":
            others = [e for e in events if e != ev]
            pick = list(rng.choice(len(others), num_choices - 1, replace=False))
            choices = [ev] + [others[int(p)] for p in pick]
            order = rng.permutation(num_choices)
            for ci, oi in enumerate(order):
                c_words[i, ci, 0] = w2i[choices[int(oi)]]
                c_mask[i, ci, 0] = True
                if int(oi) == 0:
                    labels[i] = ci
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True) + 1e-6
    vi = VideoInputs(
        frame_feats=jnp.asarray(feats),
        frame_mask=jnp.ones((n, num_frames), bool),
        q_words=jnp.asarray(q_words),
        q_chars=jnp.zeros((n, d.max_question_len, d.max_word_len), jnp.int32),
        q_mask=jnp.asarray(q_mask),
        choice_words=jnp.asarray(c_words),
        choice_chars=jnp.zeros((n, num_choices, d.max_answer_len, d.max_word_len),
                               jnp.int32),
        choice_mask=jnp.asarray(c_mask),
        label=jnp.asarray(labels),
        ex_mask=jnp.ones(n, bool),
    )
    return vi, words
