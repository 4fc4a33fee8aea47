from fvta_memexqa_tpu.ops.masking import VERY_NEGATIVE, exp_mask, masked_softmax
from fvta_memexqa_tpu.ops.lstm_ref import LSTMParams, bilstm_ref, init_lstm_params, lstm_scan_ref
from fvta_memexqa_tpu.ops.fvta_ref import (
    ATTENTION_VARIANTS,
    AttentionOutput,
    flat_attention,
    fvta_attention,
    no_attention,
    similarity_tensor,
)

__all__ = [
    "VERY_NEGATIVE",
    "exp_mask",
    "masked_softmax",
    "LSTMParams",
    "bilstm_ref",
    "init_lstm_params",
    "lstm_scan_ref",
    "ATTENTION_VARIANTS",
    "AttentionOutput",
    "flat_attention",
    "fvta_attention",
    "no_attention",
    "similarity_tensor",
]
