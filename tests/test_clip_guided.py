"""CLIP-guided lookahead decode vs a naive reference implementation.

The production path (decode/clip_guided.py) runs each tree level as one
jitted padded-shape call; these tests pin it token-for-token against a
direct transcription of the reference algorithm
(evaluate_model.py:183-310: greedy top-k branching with full recompute,
candidate texts scored by a (stubbed) CLIP cosine, commit whole lookahead
or one token). Regression tests for two round-2 review findings: an
early-stopped candidate's embeddings must come from ITS OWN tree level,
and the per-bundle compiled-level cache must key on branching factor /
repetition penalty.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clipcap_tpu.core.config import CaptionerConfig, GPT2Config, MapperConfig
from clipcap_tpu.decode.clip_guided import (generate_clip_guided,
                                            generate_clip_guided_batch)
from clipcap_tpu.models import captioner, gpt2
from clipcap_tpu.models.bundle import CaptionerBundle
from clipcap_tpu.ops.sampling import repetition_penalty

CFG = GPT2Config(vocab_size=37, n_positions=96, n_embd=32, n_layer=2, n_head=4)
SPECIAL = (0, 1, 2, 3)


class Tok:
    bos_token_id = 3
    all_special_ids = SPECIAL

    def decode_tokens(self, ids):
        return " ".join(str(i) for i in ids)


class StubScoring:
    """Deterministic 'CLIP': feature = hash bigrams of the text."""

    def embed_text(self, texts):
        rng_feats = []
        for t in texts:
            h = np.zeros(8, np.float32)
            for i, tok in enumerate(t.split()):
                h[(int(tok) + i) % 8] += 1.0 + int(tok) * 0.01
            rng_feats.append(h)
        return jnp.asarray(np.stack(rng_feats))


class ShortestScoring:
    """Always prefers the SHORTEST candidate text — forces the chosen
    candidate to be an early-stopped leaf whenever one exists (the
    stale-row regression path)."""

    def embed_text(self, texts):
        feats = np.zeros((len(texts), 2), np.float32)
        for i, t in enumerate(texts):
            feats[i, 0] = 1.0 / (1 + len(t.split()))
        return jnp.asarray(feats)


@pytest.fixture(scope="module")
def bundle():
    map_cfg = MapperConfig(dim_clip=16, dim_embedding=CFG.n_embd,
                           prefix_length=4, clip_length=4,
                           num_layers=1, num_heads=2)
    cap_cfg = CaptionerConfig(lm_type="gpt2", mapper=map_cfg)
    params = captioner.init(jax.random.PRNGKey(0), cap_cfg, CFG)
    return CaptionerBundle(params=params, cap_cfg=cap_cfg, lm_cfg=CFG,
                           tokenizer=Tok())


def naive_clip_guided(bundle, scoring, img, prefix_embeds, max_decode_length,
                      look_ahead, branching, rep_penalty, step_by_step):
    """Direct transcription of the reference tree search, full recompute,
    per-candidate embeds (no padding, no sharing)."""
    tok = bundle.tokenizer
    special = set(tok.all_special_ids)
    img = np.asarray(img, np.float32).reshape(-1)
    img = img / np.linalg.norm(img)
    bos = jnp.full((1, 1), tok.bos_token_id, jnp.int32)
    base = jnp.concatenate([prefix_embeds, bundle.embed_text(bos)], axis=1)

    committed, committed_emb = [], base
    while True:
        depth = max(min(look_ahead, max_decode_length - len(committed)), 1)
        # expand one node at a time (reference recursive_branching_topk)
        frontier = [(list(committed), committed_emb, False)]
        candidates = []
        for d in range(depth):
            nxt = []
            for toks, emb, stopped in frontier:
                logits = np.asarray(
                    gpt2.apply(bundle.params["lm"], CFG, emb)[:, -1]
                ).astype(np.float32)[0]
                if rep_penalty != 1.0 and toks:
                    l = repetition_penalty(
                        jnp.asarray(logits)[None], jnp.asarray([toks]), rep_penalty
                    )
                    logits = np.asarray(l)[0]
                order = np.argsort(-logits)[:branching]
                for nt in order:
                    nt = int(nt)
                    seq = toks + [nt]
                    emb2 = jnp.concatenate(
                        [emb, bundle.embed_text(jnp.asarray([[nt]], jnp.int32))], axis=1
                    )
                    if nt in special or d == depth - 1:
                        candidates.append((seq, emb2, nt in special))
                    else:
                        nxt.append((seq, emb2, False))
            frontier = nxt
            if not frontier:
                break
        texts = [tok.decode_tokens([t for t in c[0] if t not in special])
                 for c in candidates]
        feats = np.asarray(scoring.embed_text(texts), np.float32)
        feats = feats / np.maximum(np.linalg.norm(feats, axis=-1, keepdims=True), 1e-9)
        best = int(np.argmax(feats @ img))
        best_tokens, best_emb, stopped = candidates[best]
        if step_by_step:
            committed = best_tokens[: len(committed) + 1]
            committed_emb = best_emb[:, : committed_emb.shape[1] + 1]
            if len(committed) >= max_decode_length or committed[-1] in special:
                break
        else:
            committed, committed_emb = best_tokens, best_emb
            if stopped or len(committed) >= max_decode_length:
                break
    return tok.decode_tokens([t for t in committed if t not in special])


@pytest.mark.parametrize("step_by_step", [False, True])
@pytest.mark.parametrize("scoring", [StubScoring(), ShortestScoring()])
def test_matches_naive_reference(bundle, scoring, step_by_step):
    img = jnp.asarray(np.arange(8, dtype=np.float32) + 1.0)
    if isinstance(scoring, ShortestScoring):
        img = jnp.asarray(np.asarray([1.0, 0.1], np.float32))
    prefix = jax.random.normal(jax.random.PRNGKey(2), (1, 4, CFG.n_embd)) * 0.3

    want = naive_clip_guided(bundle, scoring, img, prefix, max_decode_length=9,
                             look_ahead=3, branching=2, rep_penalty=1.2,
                             step_by_step=step_by_step)
    got = generate_clip_guided(bundle, scoring, img, prefix,
                               max_decode_length=9, look_ahead=3,
                               branching_factor=2,
                               repetition_penalty_value=1.2,
                               step_by_step=step_by_step)
    assert got == want


@pytest.mark.parametrize("step_by_step", [False, True])
@pytest.mark.parametrize("scoring", [StubScoring(), ShortestScoring()])
def test_batch_matches_singles(bundle, scoring, step_by_step):
    """generate_clip_guided_batch == N independent single calls, per
    image, including images that finish at different chunk counts (the
    junk-row path for finished images)."""
    n = 3
    if isinstance(scoring, ShortestScoring):
        imgs = jnp.asarray(
            np.tile(np.asarray([1.0, 0.1], np.float32), (n, 1)))
    else:
        imgs = jnp.asarray(
            np.arange(n * 8, dtype=np.float32).reshape(n, 8) + 1.0)
    prefix = jax.random.normal(jax.random.PRNGKey(5), (n, 4, CFG.n_embd)) * 0.3

    singles = [
        generate_clip_guided(bundle, scoring, imgs[i], prefix[i : i + 1],
                             max_decode_length=9, look_ahead=3,
                             branching_factor=2,
                             repetition_penalty_value=1.2,
                             step_by_step=step_by_step)
        for i in range(n)
    ]
    batched = generate_clip_guided_batch(
        bundle, scoring, imgs, prefix, max_decode_length=9, look_ahead=3,
        branching_factor=2, repetition_penalty_value=1.2,
        step_by_step=step_by_step)
    assert batched == singles


def test_level_cache_keys_on_hyperparameters(bundle):
    """Round-2 review finding: two sampler configs over one bundle must
    not reuse a compiled closure with the wrong branching factor."""
    img = jnp.asarray(np.arange(8, dtype=np.float32) + 1.0)
    prefix = jax.random.normal(jax.random.PRNGKey(3), (1, 4, CFG.n_embd)) * 0.3
    scoring = StubScoring()

    a3 = generate_clip_guided(bundle, scoring, img, prefix, max_decode_length=6,
                              look_ahead=2, branching_factor=3)
    a5 = generate_clip_guided(bundle, scoring, img, prefix, max_decode_length=6,
                              look_ahead=2, branching_factor=5)  # was IndexError
    a3b = generate_clip_guided(bundle, scoring, img, prefix, max_decode_length=6,
                               look_ahead=2, branching_factor=3)
    assert a3 == a3b  # the k=3 closure survives and is reused correctly
    want5 = naive_clip_guided(bundle, scoring, img, prefix, max_decode_length=6,
                              look_ahead=2, branching=5, rep_penalty=1.2,
                              step_by_step=False)
    assert a5 == want5
