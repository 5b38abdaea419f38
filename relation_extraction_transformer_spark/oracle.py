"""Single-process NumPy oracle — the parity reference for the Spark engine.

This is an INDEPENDENT implementation of the reference pipeline semantics
(ref:eval.py lifecycle, SURVEY §3.1): plain-Python per-example preprocessing
mirroring ref:data/loader.py, and a naive per-example forward pass written
with explicit loops over heads (deliberately a different code path from the
vectorized ``kernel.py``), so that tests cross-check both the math and the
Spark plumbing.

torch is unavailable in this sandbox, so "reference parity" operationally
means parity against this oracle implementing the reference equations with
the shared seeded weights (SURVEY §5 note)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import constants as C
from .config import ModelConfig
from .weights import Params, EPS_BN, RRELU_EVAL_SLOPE


# --------------------------------------------------------------------------
# preprocessing (ref:data/loader.py:68-228), plain python
# --------------------------------------------------------------------------

def map_to_ids(tokens: list[str], vocab: dict[str, int]) -> list[int]:
    # ref:data/loader.py:287-289
    return [vocab[t] if t in vocab else C.UNK_ID for t in tokens]


def get_positions(start_idx: int, end_idx: int, length: int) -> list[int]:
    # ref:data/loader.py:292-295
    return (
        list(range(-start_idx, 0))
        + [0] * (end_idx - start_idx + 1)
        + list(range(1, length - end_idx))
    )


def bin_positions(positions: list[int]) -> list[int]:
    # ref:data/loader.py:214-228
    a = np.array(positions)
    a[a > 0] = np.floor(np.log2(a[a > 0])) + 1
    a[a < 0] = -np.floor(np.log2(-a[a < 0])) - 1
    return a.tolist()


@dataclass
class PreprocessedExample:
    """The reference's 9-tuple (ref:data/loader.py:194-197), minus the
    training-only fields we don't consume."""

    word_ids: list[int]
    pos_ids: list[int]
    ner_ids: list[int]
    subj_positions: list[int]
    obj_positions: list[int]


def preprocess_example(
    tokens: list[str],
    subj_start: int,
    subj_end: int,
    obj_start: int,
    obj_end: int,
    subj_type: str,
    obj_type: str,
    pos_tags: list[str],
    ner_tags: list[str],
    vocab: dict[str, int],
    lower: bool = False,
) -> PreprocessedExample:
    toks = list(tokens)
    if lower:  # ref:data/loader.py:101-103
        toks = [t.lower() for t in toks]
    # entity masking, subject then object (ref:data/loader.py:107-110)
    toks[subj_start : subj_end + 1] = ["SUBJ-" + subj_type] * (
        subj_end - subj_start + 1
    )
    toks[obj_start : obj_end + 1] = ["OBJ-" + obj_type] * (obj_end - obj_start + 1)
    n = len(toks)
    return PreprocessedExample(
        word_ids=map_to_ids(toks, vocab),
        pos_ids=map_to_ids(pos_tags, C.POS_TO_ID),
        ner_ids=map_to_ids(ner_tags, C.NER_TO_ID),
        subj_positions=bin_positions(get_positions(subj_start, subj_end, n)),
        obj_positions=bin_positions(get_positions(obj_start, obj_end, n)),
    )


# --------------------------------------------------------------------------
# naive forward (one example at a time, explicit head loops)
# --------------------------------------------------------------------------

def _bn(x: np.ndarray, p: Params, pre: str) -> np.ndarray:
    return (
        p[pre + "_bn_gamma"] * (x - p[pre + "_bn_mean"])
        / np.sqrt(p[pre + "_bn_var"] + EPS_BN)
        + p[pre + "_bn_beta"]
    )


def _ln(x: np.ndarray, p: Params, pre: str) -> np.ndarray:
    # LayerNorm variant (use_batch_norm=False, ref:SubLayers.py:68,164);
    # written with an explicit per-position loop to stay an independent
    # implementation from kernel._layer_norm
    out = np.empty_like(x)
    for i in range(x.shape[0]):
        row = x[i]
        mu = row.mean()
        var = ((row - mu) ** 2).mean()
        out[i] = p[pre + "_bn_gamma"] * (row - mu) / np.sqrt(var + 1e-5) \
            + p[pre + "_bn_beta"]
    return out


def _sinusoid_row(pos: int, d: int) -> np.ndarray:
    # K2 per-position sinusoid (ref:transformer/Models.py:18-31)
    row = np.empty(d)
    for j in range(d):
        angle = pos / np.power(10000.0, 2 * (j // 2) / d)
        row[j] = np.sin(angle) if j % 2 == 0 else np.cos(angle)
    return row


def _sm(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def _naive_lstm(p: Params, cfg: ModelConfig, x: np.ndarray):
    """K16, independent form: single example, explicit gate-by-gate loops
    (ref:relation_model.py:298-304; torch gate order i, f, g, o)."""
    l, d = x.shape
    hid = d
    seq_in = x
    h = None
    for layer in range(cfg.num_layers_lstm):
        pre = f"lstm{layer}_"
        h = np.zeros(hid)
        c = np.zeros(hid)
        seq_out = np.zeros((l, hid))
        for t in range(l):
            gates = (
                p[pre + "w_ih"] @ seq_in[t] + p[pre + "b_ih"]
                + p[pre + "w_hh"] @ h + p[pre + "b_hh"]
            )
            i_g = 1.0 / (1.0 + np.exp(-gates[0:hid]))
            f_g = 1.0 / (1.0 + np.exp(-gates[hid:2 * hid]))
            g_g = np.tanh(gates[2 * hid:3 * hid])
            o_g = 1.0 / (1.0 + np.exp(-gates[3 * hid:4 * hid]))
            c = f_g * c + i_g * g_g
            h = o_g * np.tanh(c)
            seq_out[t] = h
        seq_in = seq_out
    return seq_in, h


def naive_forward_example(
    p: Params, cfg: ModelConfig, ex: PreprocessedExample
) -> tuple[int, np.ndarray]:
    """Forward for a single example; returns (pred_id, probs)."""
    words = np.asarray(ex.word_ids)
    l = len(words)
    d, H, dk = cfg.d_model, cfg.n_head, cfg.d_k
    temper = d ** cfg.temper_value

    # K1 + K3
    x = np.concatenate(
        [
            p["word_emb"][words],
            p["pos_emb"][np.asarray(ex.pos_ids)],
            p["ner_emb"][np.asarray(ex.ner_ids)],
        ],
        axis=1,
    )
    obj_pos = np.asarray(ex.obj_positions)
    subj_pos = np.asarray(ex.subj_positions)
    base = x.copy()  # LSTM paths consume the raw concat (no positionals)

    if cfg.diagonal_positional_attention:
        x = x + p["enc2_emb"][obj_pos + 10]
        rel = list(range(C.ABS_MAX_LEN - l, C.ABS_MAX_LEN + l - 1))
        dpa = p["dpa_emb"][np.asarray(rel)]  # (2l-1, d)
    else:
        for i in range(l):  # K2 sinusoid path (ref:Models.py:165-168,202)
            x[i] = x[i] + _sinusoid_row(i + 1, d)
        dpa = None

    norm = _bn if cfg.use_batch_norm else _ln

    if not cfg.self_att:
        # K16 alternative path (ref:relation_model.py:439-458)
        out, hidden = _naive_lstm(p, cfg, base)
        value_seq = out
        return _naive_classify(p, cfg, out, hidden, value_seq,
                               subj_pos, obj_pos)

    out = x
    for layer in range(cfg.num_layers_encoder):
        pre = f"l{layer}_"
        residual = out.copy()
        merged = np.zeros((l, H * dk))
        for h in range(H):
            sl = slice(h * dk, (h + 1) * dk)
            q = out @ p[pre + "qs_w"].T[:, sl] + p[pre + "qs_b"][sl]
            k = out @ p[pre + "ks_w"].T[:, sl] + p[pre + "ks_b"][sl]
            v = out @ p[pre + "vs_w"].T[:, sl] + p[pre + "vs_b"][sl]
            attn = (q @ k.T) / temper
            if dpa is not None:
                dp = dpa @ p[pre + "dpa_w"].T[:, sl] + p[pre + "dpa_b"][sl]
                attn_pos = (q @ dp.T) / temper  # (l, 2l-1)
                # diagonal stripe (ref:model/transformer/Modules.py:46-90):
                # attn[i, j] += attn_pos[l-1-i, i+j]
                for i in range(l):
                    for j in range(l):
                        attn[i, j] += attn_pos[l - 1 - i, i + j]
            attn = _sm(attn)
            merged[:, sl] = attn @ v
        o = merged @ p[pre + "fc_w"].T + p[pre + "fc_b"]
        mha_out = norm(o if cfg.new_residual else o + residual, p, pre + "mha")
        hdn = mha_out @ p[pre + "ffn1_w"].T + p[pre + "ffn1_b"]
        hdn = np.where(hdn >= 0, hdn, hdn * RRELU_EVAL_SLOPE)
        hdn = hdn @ p[pre + "ffn2_w"].T + p[pre + "ffn2_b"]
        ffn_res = residual if cfg.new_residual else mha_out
        out = norm(hdn + ffn_res, p, pre + "ffn")

    hidden = out.max(axis=0)  # K15

    if cfg.self_att_and_rnn:
        value_seq, _ = _naive_lstm(p, cfg, base)  # lstm_layer=True mode
    else:
        value_seq = out
    return _naive_classify(p, cfg, out, hidden, value_seq, subj_pos, obj_pos)


def _naive_classify(p, cfg, attn_x, hidden, value_seq, subj_pos, obj_pos):
    l = attn_x.shape[0]
    # K17 (scores from attn_x, weighted sum over value_seq —
    # ref:relation_model.py:236-240)
    f = np.concatenate(
        [p["pe_emb"][subj_pos + C.MAX_LEN], p["pe_emb"][obj_pos + C.MAX_LEN]],
        axis=1,
    )
    scores = np.empty(l)
    for i in range(l):
        z = np.tanh(
            p["u_w"] @ attn_x[i] + p["u_b"]
            + p["v_w"] @ hidden + p["v_b"]
            + p["w_w"] @ f[i] + p["w_b"]
        )
        scores[i] = p["t_w"][0] @ z + p["t_b"][0]
    w = _sm(scores)
    final = w @ value_seq

    logits = p["cls_w"] @ final + p["cls_b"]
    probs = _sm(logits)
    return int(np.argmax(logits)), probs
