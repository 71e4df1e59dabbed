"""Unit tests for the decode-time logit filters (clipcap_tpu/ops/sampling.py).

Oracles are small torch implementations following the published algorithm
descriptions (Holtzman et al. nucleus; Meister et al. typical; CTRL
repetition penalty) so the JAX rewrites are checked independently.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from clipcap_tpu.ops import sampling


def torch_top_k_top_p(logits: torch.Tensor, top_k, top_p):
    """Oracle: batched top-k/top-p with per-row tensor parameters."""
    logits = logits.clone()
    b, v = logits.shape
    if not torch.is_tensor(top_k):
        top_k = torch.full((b,), float(top_k))
    if not torch.is_tensor(top_p):
        top_p = torch.full((b,), float(top_p))
    for i in range(b):
        k = float(top_k[i])
        if k > 0:
            k = max(1, int(k * v)) if k < 1 else int(k)
            k = min(k, v)
            cutoff = torch.topk(logits[i], k).values[-1]
            logits[i][logits[i] < cutoff] = float("-inf")
    for i in range(b):
        p = float(top_p[i])
        if p > 0:
            srt, idx = torch.sort(logits[i], descending=True)
            cum = torch.cumsum(F.softmax(srt, dim=-1), dim=-1)
            remove = cum > p
            remove[1:] = remove[:-1].clone()
            remove[0] = False
            logits[i][idx[remove]] = float("-inf")
    return logits


@pytest.mark.parametrize(
    "top_k,top_p",
    [
        (0, 0.0),
        (5, 0.0),
        (0, 0.7),
        (3, 0.9),
        (0.01, 0.5),  # fractional top_k = fraction of vocab
    ],
)
def test_top_k_top_p_scalar(top_k, top_p):
    torch.manual_seed(0)
    logits = torch.randn(4, 50)
    ours = sampling.top_k_top_p_filter(jnp.asarray(logits.numpy()), top_k, top_p)
    oracle = torch_top_k_top_p(logits, top_k, top_p)
    np.testing.assert_allclose(np.asarray(ours), oracle.numpy(), atol=1e-5)


def test_top_k_top_p_per_sample_vectors():
    torch.manual_seed(1)
    logits = torch.randn(5, 40)
    top_k = torch.tensor([0.0, 3.0, 0.1, 10.0, 0.0])
    top_p = torch.tensor([0.0, 0.5, 0.9, 0.3, 0.99])
    ours = sampling.top_k_top_p_filter(
        jnp.asarray(logits.numpy()), jnp.asarray(top_k.numpy()), jnp.asarray(top_p.numpy())
    )
    oracle = torch_top_k_top_p(logits, top_k, top_p)
    np.testing.assert_allclose(np.asarray(ours), oracle.numpy(), atol=1e-5)


def torch_typical(logits: torch.Tensor, typ_p: torch.Tensor, min_keep=1):
    logits = logits.clone()
    b, v = logits.shape
    for i in range(b):
        tp = float(typ_p[i])
        if tp <= 0:
            continue
        normalized = F.log_softmax(logits[i], dim=-1)
        p = normalized.exp()
        ent = -torch.nansum(normalized * p)
        shifted = torch.abs(normalized + ent)
        srt, idx = torch.sort(shifted, descending=False)
        sorted_p = p[idx]
        cum = torch.cumsum(sorted_p, dim=-1)
        last_ind = int(torch.sum(cum < tp))
        last_ind = min(last_ind, v - 1)
        remove = srt > srt[last_ind]
        remove[:min_keep] = False
        logits[i][idx[remove]] = float("-inf")
    return logits


def test_typical_filter():
    torch.manual_seed(2)
    logits = torch.randn(4, 30) * 2
    typ_p = torch.tensor([0.0, 0.25, 0.8, 0.95])
    ours = sampling.typical_filter(jnp.asarray(logits.numpy()), jnp.asarray(typ_p.numpy()))
    oracle = torch_typical(logits, typ_p)
    np.testing.assert_allclose(np.asarray(ours), oracle.numpy(), atol=1e-5)


def test_typical_filter_after_topk():
    """typical runs on already -inf-masked logits in the Gen-B sampler."""
    torch.manual_seed(3)
    logits = torch.randn(2, 30)
    logits[:, 10:] = float("-inf")
    typ_p = torch.tensor([0.5, 0.9])
    ours = sampling.typical_filter(jnp.asarray(logits.numpy()), jnp.asarray(typ_p.numpy()))
    oracle = torch_typical(logits, typ_p)
    np.testing.assert_allclose(np.asarray(ours), oracle.numpy(), atol=1e-5)


def test_repetition_penalty():
    torch.manual_seed(4)
    logits = torch.randn(3, 20)
    tokens = torch.tensor([[1, 2, 3], [4, 4, 5], [0, 19, 7]])
    penalty = 1.3

    # oracle: gather/scale/scatter
    oracle = logits.clone()
    tok_logits = torch.gather(oracle, -1, tokens)
    tok_logits = torch.where(tok_logits < 0, tok_logits * penalty, tok_logits / penalty)
    oracle.scatter_(-1, tokens, tok_logits)

    ours = sampling.repetition_penalty(
        jnp.asarray(logits.numpy()), jnp.asarray(tokens.numpy()), penalty
    )
    np.testing.assert_allclose(np.asarray(ours), oracle.numpy(), atol=1e-6)


def test_repetition_penalty_validity_mask():
    logits = jnp.asarray(np.array([[1.0, -1.0, 2.0, 0.5]]))
    tokens = jnp.asarray(np.array([[1, 2]]))
    valid = jnp.asarray(np.array([[True, False]]))  # slot for token 2 is padding
    out = sampling.repetition_penalty(logits, tokens, 2.0, tokens_valid=valid)
    np.testing.assert_allclose(
        np.asarray(out), np.array([[1.0, -2.0, 2.0, 0.5]]), atol=1e-6
    )


def test_sentence_length_penalty():
    logits = jnp.asarray(np.array([[1.0, 4.0, 2.0]]))
    out = sampling.sentence_length_penalty(
        logits, stop_token=1, current_length=25, desired_length=50, length_factor=1.0
    )
    np.testing.assert_allclose(np.asarray(out), np.array([[1.0, 2.0, 2.0]]), atol=1e-6)


def test_sample_categorical_distribution():
    # peaked distribution: argmax should dominate samples
    logits = jnp.asarray(np.array([[0.0, 5.0, 0.0, 0.0]] * 64))
    import jax

    samples = sampling.sample_categorical(jax.random.PRNGKey(0), logits, num_samples=2)
    assert samples.shape == (64, 2)
    # two samples without replacement must differ
    assert np.all(np.asarray(samples[:, 0]) != np.asarray(samples[:, 1]))
    assert (np.asarray(samples[:, 0]) == 1).mean() > 0.9


def test_prefilter_matches_full_sort():
    """The lax.top_k prefilter path must equal the full-vocab filter when
    top_k fits and the nucleus is inside the candidate set."""
    torch.manual_seed(7)
    logits = torch.randn(4, 200) * 3
    top_k = torch.tensor([0.0, 5.0, 0.05, 50.0])  # incl. fractional (of 200)
    top_p = torch.tensor([0.9, 0.5, 0.0, 0.7])
    full = sampling.top_k_top_p_filter(
        jnp.asarray(logits.numpy()), jnp.asarray(top_k.numpy()), jnp.asarray(top_p.numpy())
    )
    fast = sampling.top_k_top_p_filter(
        jnp.asarray(logits.numpy()), jnp.asarray(top_k.numpy()), jnp.asarray(top_p.numpy()),
        prefilter_k=64,
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full), atol=1e-5)


def test_prefilter_noop_when_larger_than_vocab():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 50)).astype(np.float32))
    a = sampling.top_k_top_p_filter(logits, 5, 0.8)
    b = sampling.top_k_top_p_filter(logits, 5, 0.8, prefilter_k=512)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_prefilter_falls_back_when_topk_exceeds_candidates():
    """ADVICE r1: a concrete top_k (incl. fractional) larger than
    prefilter_k must not silently diverge from full-vocab semantics."""
    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.normal(size=(3, 64)).astype(np.float32))
    exact = sampling.top_k_top_p_filter(logits, top_k=32, top_p=0.9, prefilter_k=0)
    guarded = sampling.top_k_top_p_filter(logits, top_k=32, top_p=0.9, prefilter_k=16)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(guarded), rtol=1e-6)
    # fractional: 0.6 * 64 = 38 > 16 candidates
    exact = sampling.top_k_top_p_filter(logits, top_k=0.6, prefilter_k=0)
    guarded = sampling.top_k_top_p_filter(logits, top_k=0.6, prefilter_k=16)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(guarded), rtol=1e-6)


def test_prefilter_falls_back_near_top_p_one():
    rng = np.random.default_rng(12)
    logits = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    exact = sampling.top_k_top_p_filter(logits, top_p=0.999, prefilter_k=0)
    guarded = sampling.top_k_top_p_filter(logits, top_p=0.999, prefilter_k=8)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(guarded), rtol=1e-6)


def _finite_mask(x):
    return np.isfinite(np.asarray(x))


def test_threshold_filter_matches_sort_top_p():
    """Sort-free bisection filter == sort-based filter (exact full-vocab
    semantics), across a per-row top_p sweep."""
    rng = np.random.default_rng(21)
    logits = jnp.asarray(rng.normal(size=(6, 512)).astype(np.float32) * 3)
    p = jnp.asarray([0.0, 0.1, 0.3, 0.5, 0.8, 0.95], jnp.float32)
    a = sampling.top_k_top_p_filter(logits, top_p=p)
    b = sampling.top_k_top_p_filter_threshold(logits, top_p=p)
    np.testing.assert_array_equal(_finite_mask(a), _finite_mask(b))
    np.testing.assert_allclose(np.where(_finite_mask(a), np.asarray(a), 0),
                               np.where(_finite_mask(b), np.asarray(b), 0), rtol=1e-6)


def test_threshold_filter_matches_sort_top_k():
    rng = np.random.default_rng(22)
    logits = jnp.asarray(rng.normal(size=(5, 256)).astype(np.float32) * 2)
    # incl. fractional top_k (0.25 -> floor(0.25*256)=64) and disabled rows
    k = jnp.asarray([0.0, 1.0, 7.0, 0.25, 100.0], jnp.float32)
    a = sampling.top_k_top_p_filter(logits, top_k=k)
    b = sampling.top_k_top_p_filter_threshold(logits, top_k=k)
    np.testing.assert_array_equal(_finite_mask(a), _finite_mask(b))


def test_threshold_filter_matches_sort_combined():
    rng = np.random.default_rng(23)
    logits = jnp.asarray(rng.normal(size=(4, 333)).astype(np.float32) * 3)
    k = jnp.asarray([10.0, 0.0, 50.0, 0.5], jnp.float32)
    p = jnp.asarray([0.9, 0.6, 0.0, 0.7], jnp.float32)
    a = sampling.top_k_top_p_filter(logits, top_k=k, top_p=p)
    b = sampling.top_k_top_p_filter_threshold(logits, top_k=k, top_p=p)
    np.testing.assert_array_equal(_finite_mask(a), _finite_mask(b))


def test_threshold_typical_matches_sort():
    rng = np.random.default_rng(24)
    logits = jnp.asarray(rng.normal(size=(5, 400)).astype(np.float32) * 3)
    t = jnp.asarray([0.0, 0.2, 0.5, 0.9, 0.99], jnp.float32)
    a = sampling.typical_filter(logits, t)
    b = sampling.typical_filter_threshold(logits, t)
    np.testing.assert_array_equal(_finite_mask(a), _finite_mask(b))


def test_threshold_filter_keeps_at_least_one():
    logits = jnp.asarray([[5.0, 1.0, 0.0, -2.0]], jnp.float32)
    out = sampling.top_k_top_p_filter_threshold(logits, top_p=jnp.asarray([0.01]))
    assert _finite_mask(out).sum() == 1 and np.isfinite(np.asarray(out)[0, 0])
