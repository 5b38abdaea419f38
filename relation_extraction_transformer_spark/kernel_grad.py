"""Training step for the relation classifier: loss + analytic gradients.

NumPy re-implementation of the reference's ``update()``
(ref:model/relation_model.py:51-79): weighted cross-entropy
(ref:relation_model.py:30-40), full backward through every kernel stage
(K1-K18), gradient clipping and the optimizer zoo live in ``optim.py``.
Verified against central finite differences for every parameter tensor
and every architecture-flag combination (tests/test_training.py).

Determinism choices, documented deviations:
- dropout and RReLU noise are disabled (the reference supports dropout=0;
  RReLU uses its eval slope) — stochastic regularizers are incompatible
  with a reproducible distributed gradient, and their *expected* gradient
  path is what this computes;
- BatchNorm supports both ``bn_mode="train"`` (batch statistics +
  running-stat update, torch momentum semantics) and ``"eval"`` (frozen
  affine — the fine-tuning form);
- embeddings with ``padding_idx`` in the reference (word/pos/ner/enc2/
  dpa — ref:relation_model.py:255-266, ref:transformer/Models.py:86-113)
  get their PAD row gradient zeroed; ``pe_emb`` does not
  (ref:relation_model.py:318);
- ``word_topn`` mirrors ref:torch_utils.py:311 ``keep_partial_grad``:
  only the first topn word-embedding rows receive gradient.

The gradient of the SUM form (``loss_sum``/``weight_sum``) is exposed so
per-partition gradients aggregate exactly: sum of partition grads divided
by total weight equals the full-batch mean-CE gradient bit-for-bit up to
fp summation order (operators/train.py).
"""

from __future__ import annotations

import numpy as np

from . import constants as C
from .config import ModelConfig
from .kernel import _stripe_indices, sinusoid_table
from .weights import EPS_BN, RRELU_EVAL_SLOPE, Params

BN_MOMENTUM = 0.1  # torch BatchNorm1d default
_LN_EPS = 1e-5

#: parameters that are state, not weights (never updated by the optimizer)
NON_TRAINABLE_SUFFIXES = ("_bn_mean", "_bn_var")
NON_TRAINABLE_KEYS = ("sinusoid",)

#: reference embeddings with padding_idx (PAD-row grad is dropped)
_PAD_IDX_EMBS = ("word_emb", "pos_emb", "ner_emb", "enc2_emb", "dpa_emb")


def trainable_keys(p: Params) -> list[str]:
    return sorted(
        k
        for k in p
        if not k.endswith(NON_TRAINABLE_SUFFIXES) and k not in NON_TRAINABLE_KEYS
    )


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def _softmax_bwd(dy, y, axis=-1):
    return (dy - (dy * y).sum(axis=axis, keepdims=True)) * y


class _Grads(dict):
    """Gradient accumulator: += into possibly-missing keys."""

    def add(self, k, v):
        if k in self:
            self[k] = self[k] + v
        else:
            self[k] = v


def _linear_fwd(x, p, name):
    return x @ p[f"{name}_w"].T + p[f"{name}_b"]


def _linear_bwd(dy, x, p, g: _Grads, name):
    """dy, x: (..., out) / (..., in); accumulates dW (out,in), db (out,)."""
    dy2 = dy.reshape(-1, dy.shape[-1])
    x2 = x.reshape(-1, x.shape[-1])
    g.add(f"{name}_w", dy2.T @ x2)
    g.add(f"{name}_b", dy2.sum(axis=0))
    return dy @ p[f"{name}_w"]


def _norm_fwd(x, p, pre, cfg, bn_mode, cache):
    """BatchNorm1d (channel = last axis) or LayerNorm, mirroring
    kernel._batch_norm_eval / _layer_norm; caches what backward needs."""
    if cfg.use_batch_norm:
        gamma, beta = p[pre + "_bn_gamma"], p[pre + "_bn_beta"]
        if bn_mode == "train":
            axes = tuple(range(x.ndim - 1))
            mean = x.mean(axis=axes)
            var = x.var(axis=axes)  # biased, used for normalization
            inv = 1.0 / np.sqrt(var + EPS_BN)
            xhat = (x - mean) * inv
            n = int(np.prod(x.shape[:-1]))
            cache[pre] = ("bn_train", xhat, inv, n, mean, var)
        else:
            inv = 1.0 / np.sqrt(p[pre + "_bn_var"] + EPS_BN)
            xhat = (x - p[pre + "_bn_mean"]) * inv
            cache[pre] = ("bn_eval", xhat, inv)
        return gamma * xhat + beta
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    inv = 1.0 / np.sqrt(var + _LN_EPS)
    xhat = (x - mean) * inv
    cache[pre] = ("ln", xhat, inv)
    return p[pre + "_bn_gamma"] * xhat + p[pre + "_bn_beta"]


def _norm_bwd(dy, p, pre, g: _Grads, cache):
    kind, xhat, inv = cache[pre][0], cache[pre][1], cache[pre][2]
    gamma = p[pre + "_bn_gamma"]
    if kind == "ln":
        g.add(pre + "_bn_gamma", (dy * xhat).sum(axis=tuple(range(dy.ndim - 1))))
        g.add(pre + "_bn_beta", dy.sum(axis=tuple(range(dy.ndim - 1))))
        dxhat = dy * gamma
        d = xhat.shape[-1]
        return (
            inv
            / d
            * (
                d * dxhat
                - dxhat.sum(axis=-1, keepdims=True)
                - xhat * (dxhat * xhat).sum(axis=-1, keepdims=True)
            )
        )
    axes = tuple(range(dy.ndim - 1))
    g.add(pre + "_bn_gamma", (dy * xhat).sum(axis=axes))
    g.add(pre + "_bn_beta", dy.sum(axis=axes))
    dxhat = dy * gamma
    if kind == "bn_eval":
        return dxhat * inv
    n = cache[pre][3]
    return (
        inv
        / n
        * (n * dxhat - dxhat.sum(axis=axes) - xhat * (dxhat * xhat).sum(axis=axes))
    )


def _lstm_fwd(p, cfg, x, cache_key, cache):
    """Train-twin of kernel.lstm_forward; caches gate activations."""
    B, l, d = x.shape
    H = d
    out = x
    layers = []
    h = None
    for layer in range(cfg.num_layers_lstm):
        pre = f"lstm{layer}_"
        w_ih, w_hh = p[pre + "w_ih"], p[pre + "w_hh"]
        bias = p[pre + "b_ih"] + p[pre + "b_hh"]
        h = np.zeros((B, H), dtype=out.dtype)
        c = np.zeros((B, H), dtype=out.dtype)
        xg = out @ w_ih.T + bias
        seq = np.empty_like(out)
        gates_i = np.empty((B, l, H)); gates_f = np.empty((B, l, H))
        gates_g = np.empty((B, l, H)); gates_o = np.empty((B, l, H))
        cs = np.empty((B, l, H)); hs_prev = np.empty((B, l, H))
        cs_prev = np.empty((B, l, H))
        for t in range(l):
            hs_prev[:, t] = h
            cs_prev[:, t] = c
            gx = xg[:, t] + h @ w_hh.T
            i = _sigmoid(gx[:, 0:H]); f = _sigmoid(gx[:, H:2 * H])
            gg = np.tanh(gx[:, 2 * H:3 * H]); o = _sigmoid(gx[:, 3 * H:4 * H])
            c = f * c + i * gg
            h = o * np.tanh(c)
            seq[:, t] = h
            gates_i[:, t] = i; gates_f[:, t] = f
            gates_g[:, t] = gg; gates_o[:, t] = o
            cs[:, t] = c
        layers.append((out, gates_i, gates_f, gates_g, gates_o, cs, cs_prev, hs_prev))
        out = seq
    cache[cache_key] = layers
    return out, h


def _lstm_bwd(p, cfg, dseq, dh_last, g: _Grads, cache_key, cache):
    """Backward through the cached LSTM stack.  dseq: grad of the output
    sequence of the LAST layer; dh_last: grad of its final hidden state
    (or None).  Returns grad of the stack input."""
    layers = cache[cache_key]
    d_out = dseq
    for layer in reversed(range(cfg.num_layers_lstm)):
        pre = f"lstm{layer}_"
        x_in, gi, gf, gg, go, cs, cs_prev, hs_prev = layers[layer]
        B, l, H = gi.shape
        w_ih, w_hh = p[pre + "w_ih"], p[pre + "w_hh"]
        dx = np.zeros_like(x_in)
        dh = np.zeros((B, H))
        if dh_last is not None and layer == cfg.num_layers_lstm - 1:
            dh = dh + dh_last
        dc = np.zeros((B, H))
        dw_ih = np.zeros_like(w_ih); dw_hh = np.zeros_like(w_hh)
        db = np.zeros(4 * H)
        for t in reversed(range(l)):
            dh_t = d_out[:, t] + dh
            tc = np.tanh(cs[:, t])
            do = dh_t * tc
            dct = dh_t * go[:, t] * (1.0 - tc * tc) + dc
            di = dct * gg[:, t]
            df = dct * cs_prev[:, t]
            dgg = dct * gi[:, t]
            dc = dct * gf[:, t]
            d_pre = np.concatenate(
                [
                    di * gi[:, t] * (1 - gi[:, t]),
                    df * gf[:, t] * (1 - gf[:, t]),
                    dgg * (1 - gg[:, t] * gg[:, t]),
                    do * go[:, t] * (1 - go[:, t]),
                ],
                axis=1,
            )
            dx[:, t] = d_pre @ w_ih
            dh = d_pre @ w_hh
            dw_ih += d_pre.T @ x_in[:, t]
            dw_hh += d_pre.T @ hs_prev[:, t]
            db += d_pre.sum(axis=0)
        g.add(pre + "w_ih", dw_ih)
        g.add(pre + "w_hh", dw_hh)
        g.add(pre + "b_ih", db)
        g.add(pre + "b_hh", db.copy())
        d_out = dx
    return d_out


def loss_and_grads(
    p: Params,
    cfg: ModelConfig,
    words: np.ndarray,
    pos: np.ndarray,
    ner: np.ndarray,
    subj_pos: np.ndarray,
    obj_pos: np.ndarray,
    labels: np.ndarray,
    class_weights: np.ndarray | None = None,
    bn_mode: str = "train",
    word_topn: int | None = None,
) -> tuple[float, float, dict, dict]:
    """One same-length batch -> (loss_sum, weight_sum, grads, bn_updates).

    ``grads`` are gradients of the UN-normalized weighted-CE sum; divide
    by ``weight_sum`` for the torch ``CrossEntropyLoss(weight=...)`` mean
    (done by optim.apply_update / operators.train).  ``bn_updates`` maps
    running-stat keys to (batch_mean, batch_var_unbiased, n) when
    bn_mode="train" (torch running-stat semantics), else empty.
    """
    B, l = words.shape
    g = _Grads()
    cache: dict = {}
    H, dk = cfg.n_head, cfg.d_k
    d = cfg.d_model
    temper = float(np.power(d, cfg.temper_value))

    # ----- forward (train twin of kernel.forward_batch) -----
    base = np.concatenate(
        [p["word_emb"][words], p["pos_emb"][pos], p["ner_emb"][ner]], axis=2
    )

    lstm_used = (not cfg.self_att) or cfg.self_att_and_rnn
    enc_caches = []

    if cfg.self_att:
        if cfg.diagonal_positional_attention:
            x = base + p["enc2_emb"][obj_pos + 10]
            rel = np.arange(C.ABS_MAX_LEN - l, C.ABS_MAX_LEN + l - 1)
            dpa_vec = p["dpa_emb"][rel]
        else:
            sin = sinusoid_table(C.ABS_MAX_LEN + 1, d).astype(base.dtype)
            x = base + sin[np.arange(1, l + 1)]
            dpa_vec = None

        row_idx, col_idx = _stripe_indices(l)
        out = x
        for layer in range(cfg.num_layers_encoder):
            pre = f"l{layer}_"
            residual = out

            def heads(m):
                return m.reshape(B, l, H, dk).transpose(2, 0, 1, 3)

            q = heads(_linear_fwd(out, p, pre + "qs"))
            k = heads(_linear_fwd(out, p, pre + "ks"))
            v = heads(_linear_fwd(out, p, pre + "vs"))
            attn_sum = q @ k.transpose(0, 1, 3, 2) / temper
            if dpa_vec is not None:
                dlin = _linear_fwd(dpa_vec, p, pre + "dpa")
                dproj = dlin.reshape(2 * l - 1, H, dk).transpose(1, 0, 2)
                attn_pos = q @ dproj[:, None].transpose(0, 1, 3, 2) / temper
                attn_sum = attn_sum + attn_pos[:, :, row_idx, col_idx]
            else:
                dproj = None
            A = _softmax(attn_sum, axis=-1)
            ctx = A @ v
            merged = ctx.transpose(1, 2, 0, 3).reshape(B, l, H * dk)
            o = _linear_fwd(merged, p, pre + "fc")
            mha_in = o if cfg.new_residual else o + residual
            mha_out = _norm_fwd(mha_in, p, pre + "mha", cfg, bn_mode, cache)
            h1 = _linear_fwd(mha_out, p, pre + "ffn1")
            h2 = np.where(h1 >= 0, h1, h1 * RRELU_EVAL_SLOPE)
            h3 = _linear_fwd(h2, p, pre + "ffn2")
            ffn_res = residual if cfg.new_residual else mha_out
            ffn_in = h3 + ffn_res
            new_out = _norm_fwd(ffn_in, p, pre + "ffn", cfg, bn_mode, cache)
            enc_caches.append(
                dict(residual=residual, q=q, k=k, v=v, A=A, merged=merged,
                     mha_out=mha_out, h1=h1, h2=h2, dproj=dproj,
                     enc_in=out)
            )
            out = new_out

        hidden = out.max(axis=1)
        hid_arg = out.argmax(axis=1)  # (B, d)
        if cfg.self_att_and_rnn:
            value_seq, _ = _lstm_fwd(p, cfg, base, "lstm", cache)
        else:
            value_seq = out
        attn_x = out
        last_h = None
    else:
        out, last_h = _lstm_fwd(p, cfg, base, "lstm", cache)
        attn_x = out
        value_seq = out
        hidden = last_h
        hid_arg = None

    f = np.concatenate(
        [p["pe_emb"][subj_pos + C.MAX_LEN], p["pe_emb"][obj_pos + C.MAX_LEN]],
        axis=2,
    )
    u_out = _linear_fwd(attn_x, p, "u")
    v_out = _linear_fwd(hidden, p, "v")
    w_out = _linear_fwd(f, p, "w")
    pre_t = u_out + v_out[:, None, :] + w_out
    tanh_t = np.tanh(pre_t)
    scores = tanh_t @ p["t_w"].T + p["t_b"]
    wts = _softmax(scores[..., 0], axis=-1)
    final = np.einsum("bl,bld->bd", wts, value_seq)
    logits = _linear_fwd(final, p, "cls")
    probs = _softmax(logits, axis=-1)

    # ----- weighted CE (ref:relation_model.py:30-40, torch mean form) ---
    cw = (
        np.ones(cfg.num_class) if class_weights is None else np.asarray(class_weights)
    )
    wl = cw[labels]
    nll = -np.log(probs[np.arange(B), labels])
    loss_sum = float((wl * nll).sum())
    weight_sum = float(wl.sum())

    # ----- backward -----
    dlogits = probs * wl[:, None]
    dlogits[np.arange(B), labels] -= wl
    dfinal = _linear_bwd(dlogits, final, p, g, "cls")

    dwts = (dfinal[:, None, :] * value_seq).sum(axis=-1)
    dvalue = wts[:, :, None] * dfinal[:, None, :]
    dscores0 = _softmax_bwd(dwts, wts, axis=-1)
    dscores = dscores0[..., None]
    g.add("t_w", np.einsum("blo,bla->oa", dscores, tanh_t))
    g.add("t_b", dscores.sum(axis=(0, 1)))
    dpre_t = (dscores @ p["t_w"]) * (1.0 - tanh_t * tanh_t)

    dattn_x = _linear_bwd(dpre_t, attn_x, p, g, "u")
    dhidden = _linear_bwd(dpre_t.sum(axis=1), hidden, p, g, "v")
    df = _linear_bwd(dpre_t, f, p, g, "w")
    dpe = np.zeros_like(p["pe_emb"])
    np.add.at(dpe, subj_pos + C.MAX_LEN, df[..., : cfg.pe_dim])
    np.add.at(dpe, obj_pos + C.MAX_LEN, df[..., cfg.pe_dim :])
    g.add("pe_emb", dpe)

    dbase = np.zeros_like(base)

    if cfg.self_att:
        dout = dattn_x.copy()
        # maxpool backward: route dhidden to the argmax time steps
        dh_pool = np.zeros_like(dout)
        np.put_along_axis(dh_pool, hid_arg[:, None, :], dhidden[:, None, :], axis=1)
        dout = dout + dh_pool
        if cfg.self_att_and_rnn:
            dbase += _lstm_bwd(p, cfg, dvalue, None, g, "lstm", cache)
        else:
            dout = dout + dvalue

        row_idx, col_idx = _stripe_indices(l)
        for layer in reversed(range(cfg.num_layers_encoder)):
            pre = f"l{layer}_"
            cc = enc_caches[layer]
            dffn_in = _norm_bwd(dout, p, pre + "ffn", g, cache)
            dh3 = dffn_in
            dres_extra = dffn_in  # grad into ffn_res
            dh2 = _linear_bwd(dh3, cc["h2"], p, g, pre + "ffn2")
            dh1 = np.where(cc["h1"] >= 0, dh2, dh2 * RRELU_EVAL_SLOPE)
            dmha_out = _linear_bwd(dh1, cc["mha_out"], p, g, pre + "ffn1")
            dresidual = np.zeros_like(dmha_out)
            if cfg.new_residual:
                dresidual += dres_extra
            else:
                dmha_out = dmha_out + dres_extra
            dmha_in = _norm_bwd(dmha_out, p, pre + "mha", g, cache)
            do = dmha_in
            if not cfg.new_residual:
                dresidual += dmha_in
            dmerged = _linear_bwd(do, cc["merged"], p, g, pre + "fc")
            dctx = dmerged.reshape(B, l, H, dk).transpose(2, 0, 1, 3)
            A, v, q, k = cc["A"], cc["v"], cc["q"], cc["k"]
            dA = dctx @ v.transpose(0, 1, 3, 2)
            dv = A.transpose(0, 1, 3, 2) @ dctx
            dattn_sum = _softmax_bwd(dA, A, axis=-1)
            dq = dattn_sum @ k / temper
            dk_ = dattn_sum.transpose(0, 1, 3, 2) @ q / temper
            if cc["dproj"] is not None:
                dattn_pos = np.zeros((H, B, l, 2 * l - 1), dtype=dattn_sum.dtype)
                dattn_pos[:, :, row_idx, col_idx] = dattn_sum
                dq = dq + dattn_pos @ cc["dproj"][:, None] / temper
                ddproj = np.einsum("hblm,hbld->hmd", dattn_pos, q) / temper
                ddlin = ddproj.transpose(1, 0, 2).reshape(2 * l - 1, H * dk)
                rel = np.arange(C.ABS_MAX_LEN - l, C.ABS_MAX_LEN + l - 1)
                ddpa_vec = _linear_bwd(ddlin, p["dpa_emb"][rel], p, g, pre + "dpa")
                ddpa = np.zeros_like(p["dpa_emb"])
                ddpa[rel] = ddpa_vec  # rel indices are unique
                g.add("dpa_emb", ddpa)

            def unheads(m):
                return m.transpose(1, 2, 0, 3).reshape(B, l, H * dk)

            enc_in = cc["enc_in"]
            dx_enc = _linear_bwd(unheads(dq), enc_in, p, g, pre + "qs")
            dx_enc = dx_enc + _linear_bwd(unheads(dk_), enc_in, p, g, pre + "ks")
            dx_enc = dx_enc + _linear_bwd(unheads(dv), enc_in, p, g, pre + "vs")
            dout = dx_enc + dresidual

        dx = dout
        if cfg.diagonal_positional_attention:
            denc2 = np.zeros_like(p["enc2_emb"])
            np.add.at(denc2, obj_pos + 10, dx)
            g.add("enc2_emb", denc2)
        dbase += dx  # sinusoid table is fixed (non-trainable)
    else:
        dseq = dattn_x + dvalue
        dbase += _lstm_bwd(p, cfg, dseq, dhidden, g, "lstm", cache)

    dword = np.zeros_like(p["word_emb"])
    np.add.at(dword, words, dbase[..., : cfg.emb_dim])
    dpos = np.zeros_like(p["pos_emb"])
    np.add.at(
        dpos, pos, dbase[..., cfg.emb_dim : cfg.emb_dim + cfg.pos_dim]
    )
    dner = np.zeros_like(p["ner_emb"])
    np.add.at(dner, ner, dbase[..., cfg.emb_dim + cfg.pos_dim :])
    g.add("word_emb", dword)
    g.add("pos_emb", dpos)
    g.add("ner_emb", dner)

    # padding_idx rows never learn (torch semantics)
    for name in _PAD_IDX_EMBS:
        if name in g:
            g[name][C.PAD_ID] = 0.0
    # keep_partial_grad (ref:torch_utils.py:311)
    if word_topn is not None:
        if word_topn <= 0:
            g["word_emb"][:] = 0.0
        else:
            g["word_emb"][word_topn:] = 0.0

    # zero-grads for trainable params untouched by this config path
    for key in trainable_keys(p):
        if key not in g:
            g[key] = np.zeros_like(p[key])

    bn_updates = {}
    if cfg.use_batch_norm and bn_mode == "train" and cfg.self_att:
        for layer in range(cfg.num_layers_encoder):
            for which in ("mha", "ffn"):
                pre = f"l{layer}_{which}"
                kind, _, _, n, mean, var = cache[pre]
                assert kind == "bn_train"
                bn_updates[pre] = (mean, var * n / (n - 1), n)
    return loss_sum, weight_sum, dict(g), bn_updates


def apply_bn_updates(p: Params, bn_updates: dict, momentum: float = BN_MOMENTUM):
    """torch running-stat update: r = (1 - m) * r + m * batch_stat."""
    for pre, (mean, var_unbiased, _n) in bn_updates.items():
        p[pre + "_bn_mean"] = (1 - momentum) * p[pre + "_bn_mean"] + momentum * mean
        p[pre + "_bn_var"] = (1 - momentum) * p[pre + "_bn_var"] + momentum * var_unbiased
