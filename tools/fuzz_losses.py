"""Property-based differential fuzz of the loss zoo + metrics.

Independent fp64 numpy references (loop-structured, written from the math,
not from the jax code) for every deterministic loss and metric, checked
against the production fp32 jax implementations across randomized seeded
cases: L in {1, 2, ..., 385 (kernel boundary), ...}, padding patterns
(none / heavy / one-real / all-padded slates), graded + tied labels, and
extreme scores. Gradients are verified by central finite differences OF THE
NUMPY REFERENCE (the losses cast to fp32 internally, so an fp64 re-trace of
the same code would not be independent).

Usage:
    python tools/fuzz_losses.py            # full sweep, prints a JSON report
    python tools/fuzz_losses.py --kernels  # adds kernel-vs-XLA dispatch
                                           # differentials (TPU only)

The fast CI subset lives in tests/losses/test_fuzz_differential.py.
Generalizes the reference's fixed-point test patterns
(/root/reference/tests/losses/test_neuralndcg.py:64-77 and friends).
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np

PAD = -1.0
EPS = 1e-10


# ---------------------------------------------------------------------------
# fp64 numpy references (loop-heavy on purpose — different structure from the
# vectorized masked jax formulations they check)
# ---------------------------------------------------------------------------

def _softmax(v):
    m = np.max(v)
    e = np.exp(v - m)
    return e / e.sum()


def ref_listnet(yp, yt, slate_mask=None, eps=EPS):
    B = yp.shape[0]
    per, w = [], []
    for b in range(B):
        valid = yt[b] != PAD
        if valid.any():
            p = _softmax(yp[b][valid])
            t = _softmax(yt[b][valid])
            per.append(-np.sum(t * np.log(p + eps)))
        else:
            per.append(0.0)
        w.append(1.0 if slate_mask is None else float(slate_mask[b]))
    per, w = np.array(per), np.array(w)
    return float(np.sum(per * w) / max(np.sum(w), 1.0))


def ref_binary_listnet(yp, yt, slate_mask=None, eps=EPS):
    B = yp.shape[0]
    per, w = [], []
    for b in range(B):
        valid = yt[b] != PAD
        if valid.any():
            p = _softmax(yp[b][valid])
            t = yt[b][valid]
            norm = t.sum()
            t = t / (norm if norm != 0.0 else 1.0)
            per.append(-np.sum(t * np.log(p + eps)))
        else:
            per.append(0.0)
        w.append(1.0 if slate_mask is None else float(slate_mask[b]))
    per, w = np.array(per), np.array(w)
    return float(np.sum(per * w) / max(np.sum(w), 1.0))


def _softplus(x):
    return np.logaddexp(0.0, x)


def ref_ranknet(yp, yt, slate_mask=None, weight_by_diff=False,
                weight_by_diff_powed=False):
    total, count = 0.0, 0
    for b in range(yp.shape[0]):
        if slate_mask is not None and not slate_mask[b]:
            continue
        valid = yt[b] != PAD
        for i in range(yp.shape[1]):
            for j in range(yp.shape[1]):
                if not (valid[i] and valid[j] and yt[b, i] > yt[b, j]):
                    continue
                if weight_by_diff:
                    w = abs(yt[b, i] - yt[b, j])
                elif weight_by_diff_powed:
                    w = abs(yt[b, i] ** 2 - yt[b, j] ** 2)
                else:
                    w = 1.0
                total += w * _softplus(-(yp[b, i] - yp[b, j]))
                count += 1
    return float(total / max(count, 1))


def ref_pointwise_rmse(yp, yt, no_of_levels, slate_mask=None):
    B = yp.shape[0]
    per, w = [], []
    for b in range(B):
        valid = yt[b] != PAD
        se = np.sum((yt[b][valid] - no_of_levels * yp[b][valid]) ** 2)
        per.append(math.sqrt(se / max(valid.sum(), 1)))
        w.append(1.0 if slate_mask is None else float(slate_mask[b]))
    per, w = np.array(per), np.array(w)
    return float(np.sum(per * w) / max(np.sum(w), 1.0))


def _clamped_log(p):
    return np.maximum(np.log(np.maximum(p, 0.0)), -100.0)


def ref_bce(yp, yt, slate_mask=None):
    total, n_slates = 0.0, 0.0
    for b in range(yp.shape[0]):
        sm = 1.0 if slate_mask is None else float(slate_mask[b])
        valid = yt[b] != PAD
        dl = 0.0
        for i in np.nonzero(valid)[0]:
            t, p = yt[b, i], yp[b, i]
            dl += -(t * _clamped_log(p) + (1 - t) * _clamped_log(1 - p))
        total += dl * sm
        n_slates += float(valid.any()) * sm
    return float(total / max(n_slates, 1.0))


def ref_ordinal(yp, yt, n, slate_mask=None):
    """yp: [B, L, n] sigmoid outputs."""
    total, n_docs = 0.0, 0.0
    for b in range(yp.shape[0]):
        sm = 1.0 if slate_mask is None else float(slate_mask[b])
        for i in range(yp.shape[1]):
            if yt[b, i] == PAD:
                continue
            dl = 0.0
            for kk in range(n):
                t = 1.0 if yt[b, i] >= kk + 1 else 0.0
                p = yp[b, i, kk]
                dl += -(t * _clamped_log(p) + (1 - t) * _clamped_log(1 - p))
            total += dl * sm
            n_docs += sm
    return float(total / max(n_docs, 1.0))


def ref_listmle(yp, yt, slate_mask=None, eps=EPS):
    """rng=None semantics: stable label-descending order. Only exact when
    labels are tie-free within each slate (the shuffle is then irrelevant)."""
    B, L = yp.shape
    per, w = [], []
    for b in range(B):
        order = np.argsort(-yt[b], kind="stable")
        yts, yps = yt[b][order], yp[b][order]
        valid = yts != PAD
        s = np.where(valid, yps, -np.inf)
        finite = s[np.isfinite(s)]
        mx = finite.max() if finite.size else 0.0
        shifted = s - mx
        loss = 0.0
        for i in range(L):
            if not valid[i]:
                continue
            tail = np.sum(np.exp(shifted[i:][valid[i:]]))
            loss += np.log(tail + eps) - shifted[i]
        per.append(loss)
        w.append(1.0 if slate_mask is None else float(slate_mask[b]))
    per, w = np.array(per), np.array(w)
    return float(np.sum(per * w) / max(np.sum(w), 1.0))


def _lambda_weight(scheme, i, j, G, D, t, mu):
    if scheme is None or scheme == "rankNet_scheme":
        return 1.0
    if scheme == "ndcgLoss1_scheme":
        return G[i] / D[i]
    if scheme == "rankNetWeightedByGTDiff_scheme":
        return abs(t[i] - t[j])
    if scheme == "rankNetWeightedByGTDiffPowed_scheme":
        return abs(t[i] ** 2 - t[j] ** 2)
    # delta-of-inverse-discount term, positions 1-based
    delta = abs((i + 1) - (j + 1))
    if delta == 0:
        d2 = 0.0
    else:
        prev = 1.0 / D[delta - 1] if delta - 1 >= 0 else 1.0 / D[0]
        d2 = abs(prev - 1.0 / D[delta])
    loss2 = d2 * abs(G[i] - G[j])
    lrank = abs(1.0 / D[i] - 1.0 / D[j]) * abs(G[i] - G[j])
    if scheme == "ndcgLoss2_scheme":
        return loss2
    if scheme == "lambdaRank_scheme":
        return lrank
    if scheme == "ndcgLoss2PP_scheme":
        return mu * loss2 + lrank
    raise ValueError(scheme)


def ref_lambdaloss(yp, yt, weighing_scheme=None, k=None, sigma=1.0, mu=10.0,
                   reduction="sum", reduction_log="binary", slate_mask=None,
                   eps=EPS):
    B, L = yp.shape
    k_eff = L if k is None else min(k, L)
    log_base = math.log(2.0) if reduction_log == "binary" else 1.0
    D_full = np.log2(np.arange(L, dtype=np.float64) + 2.0)
    total, count = 0.0, 0
    for b in range(B):
        mask = yt[b] == PAD
        ypf = np.where(mask, -np.inf, yp[b])
        ytf = np.where(mask, -np.inf, yt[b])
        order = np.argsort(-ypf, kind="stable")
        ps = ypf[order][:k_eff]
        raw = ytf[order][:k_eff]
        desc = np.maximum(np.sort(ytf)[::-1], 0.0)
        maxdcg = max(np.sum((2.0 ** desc[:k_eff] - 1.0) / D_full[:k_eff]), eps)
        valid = np.isfinite(raw)
        t = np.maximum(raw, 0.0)
        G = (2.0 ** t - 1.0) / maxdcg
        D = D_full[:k_eff]
        sm_ok = slate_mask is None or bool(slate_mask[b])
        for i in range(k_eff):
            for j in range(k_eff):
                if not (valid[i] and valid[j] and sm_ok):
                    continue
                if weighing_scheme != "ndcgLoss1_scheme" and not (
                    raw[i] - raw[j] > 0
                ):
                    continue
                w = _lambda_weight(weighing_scheme, i, j, G, D, t, mu)
                s = np.clip(ps[i] - ps[j], -1e8, 1e8)
                sig = 1.0 / (1.0 + np.exp(-sigma * s))
                pair = max(w * np.log(max(sig, eps)), math.log(eps)) / log_base
                total += pair
                count += 1
    if reduction == "sum":
        return float(-total)
    return float(-total / max(count, 1))


def ref_approxndcg(yp, yt, alpha=1.0, slate_mask=None, eps=EPS):
    B, L = yp.shape
    D = np.log2(np.arange(L, dtype=np.float64) + 2.0)
    per, w = [], []
    for b in range(B):
        mask = yt[b] == PAD
        ypf = np.where(mask, -np.inf, yp[b])
        ytf = np.where(mask, -np.inf, yt[b])
        order = np.argsort(-ypf, kind="stable")
        ps = ypf[order]
        raw = ytf[order]
        valid = np.isfinite(raw)
        desc = np.maximum(np.sort(ytf)[::-1], 0.0)
        maxdcg = max(np.sum((2.0 ** desc - 1.0) / D), eps)
        G = (2.0 ** np.maximum(raw, 0.0) - 1.0) / maxdcg
        approx = 0.0
        for i in range(L):
            if not valid[i]:
                continue
            pos = 1.0
            for j in range(L):
                if j == i or not valid[j]:
                    continue
                with np.errstate(over="ignore"):
                    sig = 1.0 / (1.0 + np.exp(alpha * (ps[i] - ps[j])))
                pos += max(sig, eps)
            approx += G[i] / np.log2(1.0 + pos)
        per.append(approx)
        w.append(1.0 if slate_mask is None else float(slate_mask[b]))
    per, w = np.array(per), np.array(w)
    return float(-np.sum(per * w) / max(np.sum(w), 1.0))


def _neural_sort(s, mask, tau):
    """Deterministic NeuralSort relaxation [L, L] for one slate (fp64)."""
    L = s.shape[0]
    s = np.where(mask, -1e8, s)
    a = np.abs(s[:, None] - s[None, :])
    pair_pad = mask[:, None] | mask[None, :]
    a = np.where(pair_pad, 0.0, a)
    row_sums = a.sum(axis=1)
    valid_n = float(L - mask.sum())
    jj = np.arange(1, L + 1, dtype=np.float64)
    scaling = np.where(jj <= valid_n, valid_n + 1.0 - 2.0 * jj, 0.0)
    sz = np.where(mask, 0.0, s)
    p_max = scaling[:, None] * sz[None, :] - row_sums[None, :]
    p_max = np.where(pair_pad, -np.inf, p_max)
    both = mask[:, None] & mask[None, :]
    p_max = np.where(both, 1.0, p_max)
    out = np.empty_like(p_max)
    for i in range(L):
        out[i] = _softmax(p_max[i] / tau)
    return out


def _sinkhorn(mats, masks, tol=1e-6, max_iter=50):
    """Column-first Sinkhorn in diagonal form with the GLOBAL tol-freeze of
    ops/soft_sort.sinkhorn_scaling. mats: [N, L, L], masks: [N, L]."""
    m0 = mats.copy()
    for n in range(m0.shape[0]):
        either = masks[n][:, None] | masks[n][None, :]
        both = masks[n][:, None] & masks[n][None, :]
        m0[n] = np.where(either, 0.0, m0[n])
        m0[n] = np.where(both, 1.0, m0[n])
    N, L, _ = m0.shape
    a = np.ones((N, L))
    b = np.ones((N, L))
    done, row_resid = False, np.inf
    for _ in range(max_iter):
        col = b * np.einsum("nij,ni->nj", m0, a)
        resid = max(np.max(np.abs(col - 1.0)), row_resid)
        done = done or resid < tol
        if not done:
            # zero-col/row freeze + scaling saturation (mirrors
            # ops/soft_sort.sinkhorn_scaling incl. SCALING_CAP)
            b = np.where(col == 0.0, b,
                         np.minimum(b / np.maximum(col, EPS), 1e15))
            row = a * np.einsum("nij,nj->ni", m0, b)
            a = np.where(row == 0.0, a,
                         np.minimum(a / np.maximum(row, EPS), 1e15))
            row_resid = np.max(np.abs(row / np.maximum(row, EPS) - 1.0))
    out = a[:, :, None] * m0 * b[:, None, :]
    for n in range(N):
        either = masks[n][:, None] | masks[n][None, :]
        out[n] = np.where(either, 0.0, out[n])
    return out


def _ref_dcg_row(scores, labels, at, gain):
    order = np.argsort(-np.where(labels == PAD, -np.inf, scores),
                       kind="stable")
    lab = np.where(labels == PAD, 0.0, labels)[order]
    g = (2.0 ** lab - 1.0) if gain == "pow2" else lab
    D = np.log2(np.arange(len(lab), dtype=np.float64) + 2.0)
    return float(np.sum(g[:at] / D[:at]))


def ref_neuralndcg(yp, yt, temperature=1.0, powered_relevancies=True, k=None,
                   slate_mask=None, transposed=False):
    """Deterministic variant only (stochastic is covered by sample-level
    property checks, not a value oracle)."""
    B, L = yp.shape
    k_eff = L if k is None else min(k, L)
    gain = "pow2" if powered_relevancies else "identity"
    masks = yt == PAD
    p_hats = np.stack([_neural_sort(yp[b], masks[b], temperature)
                       for b in range(B)])
    p_hats = _sinkhorn(p_hats, masks)
    D = 1.0 / np.log2(np.arange(L, dtype=np.float64) + 2.0)
    total, n_valid = 0.0, 0.0
    for b in range(B):
        labv = np.where(masks[b], 0.0, yt[b])
        gains = (2.0 ** labv - 1.0) if powered_relevancies else labv
        # IDCG is ALWAYS powered in the transposed variant (reference quirk)
        idcg = _ref_dcg_row(yt[b], yt[b], k_eff,
                            "pow2" if transposed else gain)
        ok = idcg != 0.0 and (slate_mask is None or bool(slate_mask[b]))
        if not ok:
            continue
        if transposed:
            disc = np.where(np.arange(L) >= k_eff, 0.0, D)
            expected_disc = p_hats[b].T @ disc
            val = np.sum(gains * expected_disc) / (idcg + EPS)
        else:
            soft_gains = p_hats[b] @ gains
            val = np.sum((soft_gains * D)[:k_eff]) / (idcg + EPS)
        total += val
        n_valid += 1.0
    if n_valid == 0.0:
        return 0.0
    return float(-total / max(n_valid, 1.0))


# metrics -------------------------------------------------------------------

def ref_ndcg(yp, yt, at):
    out = []
    for b in range(yp.shape[0]):
        idcg = _ref_dcg_row(yt[b], yt[b], at, "pow2")
        if idcg == 0.0:
            out.append(1.0)
        else:
            out.append(_ref_dcg_row(yp[b], yt[b], at, "pow2") / idcg)
    return np.array(out)


def ref_dcg(yp, yt, at):
    return np.array([_ref_dcg_row(yp[b], yt[b], at, "pow2")
                     for b in range(yp.shape[0])])


def ref_mrr(yp, yt, at):
    B, L = yp.shape
    res = np.zeros(B)
    batch_max_sum = 0.0
    for b in range(B):
        order = np.argsort(-np.where(yt[b] == PAD, -np.inf, yp[b]),
                           kind="stable")
        lab = np.where(yt[b] == PAD, 0.0, yt[b])[order]
        batch_max_sum += lab.max()
        pos = int(np.argmax(lab))
        res[b] = (1.0 / (pos + 1.0)) if pos < at else 0.0
    if batch_max_sum == 0.0:  # the reference's batch-global quirk
        res[:] = 0.0
    return res


def ref_map(yp, yt, at, threshold=1.0):
    out = []
    for b in range(yp.shape[0]):
        order = np.argsort(-np.where(yt[b] == PAD, -np.inf, yp[b]),
                           kind="stable")
        lab = np.where(yt[b] == PAD, 0.0, yt[b])[order]
        rel = (lab >= threshold).astype(np.float64)
        if rel.sum() == 0.0:
            out.append(1.0)
            continue
        ap, hits = 0.0, 0.0
        for i in range(at):
            if rel[i]:
                hits += 1.0
                ap += hits / (i + 1.0)
        out.append(ap / min(rel.sum(), at))
    return np.array(out)


def ref_err(yp, yt, at, max_rel=4.0):
    out = []
    for b in range(yp.shape[0]):
        order = np.argsort(-np.where(yt[b] == PAD, -np.inf, yp[b]),
                           kind="stable")
        lab = np.where(yt[b] == PAD, 0.0, yt[b])[order]
        stop = (2.0 ** lab - 1.0) / (2.0 ** max_rel)
        reach, total = 1.0, 0.0
        for i in range(at):
            total += reach * stop[i] / (i + 1.0)
            reach *= 1.0 - stop[i]
        out.append(total)
    return np.array(out)


# ---------------------------------------------------------------------------
# case generation
# ---------------------------------------------------------------------------

def gen_case(rng, B, L, pad_pattern="random", ties=False, extreme=False,
             unique_labels=False, min_gap=0.0):
    """One (y_pred [B, L] fp32-exact fp64, y_true, slate_mask) case."""
    yp = rng.randn(B, L) * 3.0
    if min_gap > 0.0:
        # pairwise prediction gaps > min_gap per slate: FD-safe vs sort flips
        base = np.arange(L, dtype=np.float64) * max(min_gap * 4.0, 0.05)
        for b in range(B):
            yp[b] = rng.permutation(base) + rng.uniform(
                -min_gap, min_gap, size=L)
    if ties:
        yp = np.round(yp)  # heavy score ties
    if extreme:
        yp[rng.rand(B, L) < 0.2] *= 1e8
    if unique_labels:
        yt = np.stack([rng.permutation(L).astype(np.float64)
                       for _ in range(B)])
    else:
        yt = rng.randint(0, 5, size=(B, L)).astype(np.float64)
        if rng.rand() < 0.3:
            yt[rng.randint(B)] = 0.0  # an all-zero-relevance slate
    if pad_pattern == "none":
        pass
    elif pad_pattern == "heavy":
        pad = rng.rand(B, L) < 0.6
        pad[:, 0] = False  # keep one real doc
        yt = np.where(pad, PAD, yt)
    elif pad_pattern == "one_real":
        yt[:, 1:] = PAD
    elif pad_pattern == "with_all_padded":
        pad = rng.rand(B, L) < 0.3
        yt = np.where(pad, PAD, yt)
        yt[0] = PAD  # a fully padded slate
    else:  # random
        pad = rng.rand(B, L) < 0.25
        yt = np.where(pad, PAD, yt)
    slate_mask = None
    if rng.rand() < 0.5 and B > 1:
        slate_mask = rng.rand(B) < 0.8
        slate_mask[0] = True
        # dummy slates are all-padding in the real batcher
        yt = np.where(slate_mask[:, None], yt, PAD)
    # fp32-exact values so fp32/fp64 sort orders agree
    yp = yp.astype(np.float32).astype(np.float64)
    yt = yt.astype(np.float32).astype(np.float64)
    return yp, yt, slate_mask


# ---------------------------------------------------------------------------
# differential runners
# ---------------------------------------------------------------------------

def _jax_loss(name, kwargs):
    # NB: rng is deliberately NOT injected — every spec'd variant is
    # deterministic (listMLE's rng=None path IS the reference semantics the
    # numpy oracle implements; stochastic NeuralNDCG has no value oracle and
    # is covered by the finiteness block + its own temperature-limit tests)
    from allrank_tpu.losses import get_loss

    fn, _needs_rng = get_loss(name)

    def run(yp, yt, slate_mask):
        import jax.numpy as jnp

        return float(fn(jnp.asarray(yp, jnp.float32),
                        jnp.asarray(yt, jnp.float32),
                        slate_mask=None if slate_mask is None
                        else jnp.asarray(slate_mask), **kwargs))

    return run


def _jax_grad(name, kwargs):
    import jax

    from allrank_tpu.losses import get_loss

    fn, _needs_rng = get_loss(name)

    def run(yp, yt, slate_mask):
        import jax.numpy as jnp

        def f(p):
            return fn(p, jnp.asarray(yt, jnp.float32),
                      slate_mask=None if slate_mask is None
                      else jnp.asarray(slate_mask), **kwargs)

        return np.asarray(jax.grad(f)(jnp.asarray(yp, jnp.float32)),
                          dtype=np.float64)

    return run


LOSS_SPECS = []


def _register_specs():
    """(name, jax_kwargs, ref_fn(yp, yt, slate_mask) -> float, needs)."""
    global LOSS_SPECS
    specs = [
        ("listNet", {}, lambda yp, yt, sm: ref_listnet(yp, yt, sm), {}),
        ("binary_listNet", {},
         lambda yp, yt, sm: ref_binary_listnet(yp, yt, sm), {}),
        ("rankNet", {}, lambda yp, yt, sm: ref_ranknet(yp, yt, sm), {}),
        ("rankNet_weightByGTDiff", {},
         lambda yp, yt, sm: ref_ranknet(yp, yt, sm, weight_by_diff=True), {}),
        ("rankNet_weightByGTDiff_pow", {},
         lambda yp, yt, sm: ref_ranknet(yp, yt, sm,
                                        weight_by_diff_powed=True), {}),
        ("pointwise_rmse", {"no_of_levels": 4.0},
         lambda yp, yt, sm: ref_pointwise_rmse(yp, yt, 4.0, sm), {}),
        ("listMLE", {},
         lambda yp, yt, sm: ref_listmle(yp, yt, sm),
         {"unique_labels": True}),
        ("approxNDCGLoss", {"alpha": 2.0},
         lambda yp, yt, sm: ref_approxndcg(yp, yt, 2.0, sm), {}),
        ("neuralNDCG", {"temperature": 0.5},
         lambda yp, yt, sm: ref_neuralndcg(yp, yt, 0.5, slate_mask=sm), {}),
        ("neuralNDCG", {"temperature": 1.0, "k": 3,
                        "powered_relevancies": False},
         lambda yp, yt, sm: ref_neuralndcg(
             yp, yt, 1.0, powered_relevancies=False, k=3, slate_mask=sm),
         {"tag": "at_k_identity"}),
        ("neuralNDCG_transposed", {"temperature": 0.5},
         lambda yp, yt, sm: ref_neuralndcg(yp, yt, 0.5, slate_mask=sm,
                                           transposed=True), {}),
    ]
    for scheme in (None, "ndcgLoss1_scheme", "ndcgLoss2_scheme",
                   "lambdaRank_scheme", "ndcgLoss2PP_scheme",
                   "rankNet_scheme", "rankNetWeightedByGTDiff_scheme",
                   "rankNetWeightedByGTDiffPowed_scheme"):
        for red, k in (("sum", None), ("mean", 4)):
            specs.append((
                "lambdaLoss",
                {"weighing_scheme": scheme, "reduction": red, "k": k},
                (lambda yp, yt, sm, s=scheme, r=red, kk=k:
                 ref_lambdaloss(yp, yt, weighing_scheme=s, reduction=r, k=kk,
                                slate_mask=sm)),
                {"tag": f"{scheme}-{red}"},
            ))
    LOSS_SPECS = specs


_register_specs()

METRIC_SPECS = [
    ("ndcg", ref_ndcg, {}),
    ("dcg", ref_dcg, {}),
    ("mrr", ref_mrr, {}),
    ("map", ref_map, {}),
    ("err", ref_err, {}),
]


def check_value(name, kwargs, ref_fn, yp, yt, sm, rtol, atol):
    got = _jax_loss(name, kwargs)(yp, yt, sm)
    want = ref_fn(yp, yt, sm)
    ok = math.isfinite(got) and abs(got - want) <= atol + rtol * abs(want)
    return ok, got, want


def check_grad_fd(name, kwargs, ref_fn, yp, yt, sm, n_coords, rng,
                  h=1e-3, rtol=5e-2, atol=5e-4):
    """fp32 jax grad vs central differences of the fp64 numpy reference."""
    g = _jax_grad(name, kwargs)(yp, yt, sm)
    if not np.isfinite(g).all():
        return False, "non-finite gradient"
    B, L = yp.shape
    scale = max(np.abs(g).max(), 1.0)
    for _ in range(n_coords):
        b, i = rng.randint(B), rng.randint(L)
        if name == "pointwise_rmse":
            # |y - n*p| has a kink at y == n*p — FD straddling it is an
            # artifact of the probe, not a defect; probe elsewhere
            n_lv = kwargs["no_of_levels"]
            if abs(yt[b, i] - n_lv * yp[b, i]) < 4.0 * n_lv * h:
                continue
        e = np.zeros_like(yp)
        e[b, i] = h
        fd = (ref_fn(yp + e, yt, sm) - ref_fn(yp - e, yt, sm)) / (2 * h)
        if abs(fd - g[b, i]) > atol * scale + rtol * max(abs(fd), abs(g[b, i])):
            return False, f"coord ({b},{i}): fd={fd:.6g} grad={g[b, i]:.6g}"
    return True, ""


def check_metric(name, ref_fn, yp, yt, at, rtol=2e-5, atol=1e-5):
    import jax.numpy as jnp

    from allrank_tpu.metrics import get_metric

    got = np.asarray(get_metric(name)(jnp.asarray(yp, jnp.float32),
                                      jnp.asarray(yt, jnp.float32),
                                      ats=[at]))[:, 0]
    want = ref_fn(yp, yt, at)
    ok = np.isfinite(got).all() and np.allclose(got, want, rtol=rtol,
                                                atol=atol)
    return bool(ok), got, want


# per-loss fp32-vs-fp64 value tolerances (transcendental-chain dependent)
VALUE_TOLS = {
    "lambdaLoss": (3e-4, 2e-4),       # sum reduction accumulates O(k^2) terms
    "approxNDCGLoss": (2e-4, 1e-5),
    "neuralNDCG": (5e-4, 5e-4),       # 50 sinkhorn iterations in fp32
    "neuralNDCG_transposed": (5e-4, 5e-4),
    "listMLE": (2e-4, 1e-5),
}
DEFAULT_TOL = (5e-5, 1e-6)


def run_sweep(seeds, Ls, B=5, grad_coords=4, pad_patterns=None,
              include_extreme=True, verbose=False):
    pad_patterns = pad_patterns or ["none", "random", "heavy", "one_real",
                                    "with_all_padded"]
    failures, checked = [], 0
    for seed in seeds:
        rng = np.random.RandomState(seed)
        for L in Ls:
            for pat in pad_patterns:
                if L == 1 and pat == "one_real":
                    continue
                for name, kwargs, ref_fn, needs in LOSS_SPECS:
                    yp, yt, sm = gen_case(
                        rng, B, L, pad_pattern=pat,
                        unique_labels=needs.get("unique_labels", False),
                        min_gap=2e-3,
                    )
                    rtol, atol = VALUE_TOLS.get(name, DEFAULT_TOL)
                    ok, got, want = check_value(name, kwargs, ref_fn, yp, yt,
                                                sm, rtol, atol)
                    checked += 1
                    if not ok:
                        failures.append(
                            dict(loss=name, kwargs=str(kwargs), seed=seed,
                                 L=L, pattern=pat, got=got, want=want))
                    elif grad_coords and L <= 64:
                        okg, msg = check_grad_fd(name, kwargs, ref_fn, yp, yt,
                                                 sm, grad_coords, rng)
                        checked += 1
                        if not okg:
                            failures.append(
                                dict(loss=name + ":grad", kwargs=str(kwargs),
                                     seed=seed, L=L, pattern=pat, msg=msg))
                for mname, mref, _ in METRIC_SPECS:
                    yp, yt, _sm = gen_case(rng, B, L, pad_pattern=pat)
                    at = int(rng.randint(1, L + 1))
                    ok, got, want = check_metric(mname, mref, yp, yt, at)
                    checked += 1
                    if not ok:
                        failures.append(
                            dict(metric=mname, seed=seed, L=L, at=at,
                                 pattern=pat, got=got.tolist(),
                                 want=want.tolist()))
            # heavy score TIES (fp-identical values): both sides sort stably,
            # so values must still agree exactly within tolerance
            for name, kwargs, ref_fn, needs in LOSS_SPECS:
                yp, yt, sm = gen_case(
                    rng, B, L, pad_pattern="random", ties=True,
                    unique_labels=needs.get("unique_labels", False))
                rtol, atol = VALUE_TOLS.get(name, DEFAULT_TOL)
                if name.startswith("neuralNDCG"):
                    # mass ties make the neural-sort matrix ill-conditioned;
                    # 50 fp32 sinkhorn iterations then drift up to ~2e-3
                    # from the fp64 oracle (measured) — precision, not logic
                    rtol, atol = 4e-3, 4e-3
                ok, got, want = check_value(name, kwargs, ref_fn, yp, yt, sm,
                                            rtol, atol)
                checked += 1
                if not ok:
                    failures.append(
                        dict(loss=name + ":ties", kwargs=str(kwargs),
                             seed=seed, L=L, got=got, want=want))
        # extreme scores: finiteness of value + gradient for every loss
        if include_extreme:
            rng_e = np.random.RandomState(seed + 10_000)
            for name, kwargs, _ref, needs in LOSS_SPECS:
                yp, yt, sm = gen_case(
                    rng_e, B, 12, pad_pattern="random", extreme=True,
                    unique_labels=needs.get("unique_labels", False))
                v = _jax_loss(name, kwargs)(yp, yt, sm)
                g = _jax_grad(name, kwargs)(yp, yt, sm)
                checked += 1
                if not (math.isfinite(v) and np.isfinite(g).all()):
                    failures.append(dict(loss=name + ":extreme",
                                         kwargs=str(kwargs), seed=seed,
                                         value=v))
    return dict(checked=checked, failures=failures)


def run_kernel_differential(seeds, Ls, B=8):
    """Kernel-dispatch vs XLA-path differential (value + grad) — the L=384/385
    square-kernel boundary and friends. Meaningful on TPU where the kernels
    actually dispatch; on CPU both sides take the XLA path (vacuous pass)."""
    import allrank_tpu.losses.neuralndcg as nn_mod
    import allrank_tpu.ops.approx_pallas as ap
    import allrank_tpu.ops.lambda_pallas as lp
    import allrank_tpu.ops.lambda_tiled as lt

    failures, checked = [], 0
    # neuralndcg binds soft_sort_available at module level -> patch THAT name
    # (its sinkhorn fallback still uses the fused sinkhorn kernel on TPU, so
    # the neuralNDCG rows compare fused-full-chain vs XLA-sort+fused-sinkhorn)
    patches = [(lp, "lambda_pairs_available"), (lt, "tiled_lambda_preferred"),
               (ap, "approx_pos_available"), (nn_mod, "soft_sort_available")]

    def with_xla_forced(fn, *args):
        saved = [(m, n, getattr(m, n)) for m, n in patches]
        try:
            for m, n in patches:
                setattr(m, n, lambda *a, **k: False)
            return fn(*args)
        finally:
            for m, n, v in saved:
                setattr(m, n, v)

    cases = [("lambdaLoss", {"weighing_scheme": s})
             for s in (None, "ndcgLoss2PP_scheme", "ndcgLoss1_scheme",
                       "lambdaRank_scheme")]
    cases += [("lambdaLoss", {"weighing_scheme": "ndcgLoss2_scheme",
                              "reduction": "mean", "k": 10}),
              ("approxNDCGLoss", {}),
              ("neuralNDCG", {"temperature": 1.0}),
              ("neuralNDCG_transposed", {"temperature": 1.0})]
    for seed in seeds:
        rng = np.random.RandomState(seed)
        for L in Ls:
            for name, kwargs in cases:
                yp, yt, sm = gen_case(rng, B, L, pad_pattern="random")
                v_fn, g_fn = _jax_loss(name, kwargs), _jax_grad(name, kwargs)
                v_k = v_fn(yp, yt, sm)
                g_k = g_fn(yp, yt, sm)
                v_x = with_xla_forced(v_fn, yp, yt, sm)
                g_x = with_xla_forced(g_fn, yp, yt, sm)
                checked += 1
                val_ok = abs(v_k - v_x) <= 1e-4 + 2e-4 * abs(v_x)
                scale = max(np.abs(g_x).max(), 1e-6)
                grad_ok = np.max(np.abs(g_k - g_x)) <= 1e-3 * scale
                if not (val_ok and grad_ok):
                    failures.append(dict(loss=name, kwargs=str(kwargs),
                                         seed=seed, L=L, v_kernel=v_k,
                                         v_xla=v_x,
                                         grad_maxdiff=float(
                                             np.max(np.abs(g_k - g_x)))))
    return dict(checked=checked, failures=failures)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seeds", type=int, default=4)
    parser.add_argument("--kernels", action="store_true",
                        help="kernel-vs-XLA dispatch differential (TPU)")
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    if args.quick:
        Ls = [1, 2, 7, 12]
        seeds = list(range(2))
    else:
        Ls = [1, 2, 3, 7, 12, 31, 64, 240, 384, 385]
        seeds = list(range(args.seeds))

    report = {"sweep": run_sweep(seeds, Ls)}
    if args.kernels:
        report["kernel_differential"] = run_kernel_differential(
            list(range(2)), [64, 240, 384, 385, 512])
    n_fail = sum(len(v["failures"]) for v in report.values())
    print(json.dumps(report if n_fail else
                     {k: {"checked": v["checked"], "failures": []}
                      for k, v in report.items()}, indent=1, default=str))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
