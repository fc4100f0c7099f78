import jax
import jax.numpy as jnp
import numpy as np

from sbl_for_multilingual_lip_reading_tpu.decode import (
    beam_search, build_bigram_matrix)
from sbl_for_multilingual_lip_reading_tpu.decode.beam import make_uni_beam_decoder
from sbl_for_multilingual_lip_reading_tpu.models.decoder_uni import UniDecoder
from sbl_for_multilingual_lip_reading_tpu.models.encoder import Encoder
from sbl_for_multilingual_lip_reading_tpu.vocab import EOS_ID, SOS_ID

V = 6


def _const_step_fn(step_logits):
    """Per-step fixed logits (independent of prefix), (maxlen, V)."""
    def fn(ys, step):
        N = ys.shape[0]
        return jnp.broadcast_to(step_logits[step], (N, V))
    return fn


def test_beam_finds_argmax_path():
    maxlen = 4
    rng = np.random.RandomState(0)
    step_logits = jnp.asarray(rng.randn(maxlen, V).astype(np.float32))
    enc = jnp.zeros((2, 3, 8))
    tokens, scores = beam_search(_const_step_fn(step_logits), enc,
                                 beam_size=3, maxlen=maxlen, vocab_size=V)
    assert tokens.shape == (2, 3, maxlen + 1)
    best = np.asarray(tokens[0, 0])
    expect = np.argmax(np.asarray(step_logits), -1)
    # with prefix-independent logits the greedy path is optimal
    np.testing.assert_array_equal(best[1:], expect)
    # scores sorted descending
    s = np.asarray(scores[0])
    assert np.all(np.diff(s) <= 1e-6)
    # best score = sum of log-softmax maxima
    lp = jax.nn.log_softmax(step_logits, -1)
    assert abs(float(scores[0, 0]) - float(jnp.sum(jnp.max(lp, -1)))) < 1e-4


def test_beam_eos_freezes_score():
    maxlen = 4
    # step 0 strongly prefers eos -> hyp finishes immediately, score frozen
    step_logits = np.full((maxlen, V), -5.0, np.float32)
    step_logits[0, EOS_ID] = 10.0
    step_logits[1:, 3] = 5.0
    enc = jnp.zeros((1, 2, 4))
    tokens, scores = beam_search(_const_step_fn(jnp.asarray(step_logits)),
                                 enc, beam_size=2, maxlen=maxlen,
                                 vocab_size=V)
    best = np.asarray(tokens[0, 0])
    assert best[1] == EOS_ID
    # frozen: every continuation is eos
    np.testing.assert_array_equal(best[2:], EOS_ID)
    lp0 = jax.nn.log_softmax(jnp.asarray(step_logits[0]))
    assert abs(float(scores[0, 0]) - float(lp0[EOS_ID])) < 1e-4


def test_bigram_bias_changes_path():
    maxlen = 2
    logits = np.zeros((maxlen, V), np.float32)  # uniform model
    enc = jnp.zeros((1, 2, 4))
    # bigram: after sos, token 4 is 100x more likely
    counts = [[SOS_ID, 4], [SOS_ID, 4], [SOS_ID, 3]]
    big = build_bigram_matrix(counts, V, floor=1e-4)
    tokens, _ = beam_search(_const_step_fn(jnp.asarray(logits)), enc,
                            beam_size=2, maxlen=maxlen, vocab_size=V,
                            bigram_logp=jnp.log(jnp.asarray(big)))
    assert int(tokens[0, 0, 1]) == 4


def test_bigram_matrix_counts():
    seqs = [[2, 3], [2, 4]]
    m = build_bigram_matrix(seqs, 6, floor=0.0, normalize=True)
    # sos->2 always
    assert m[SOS_ID, 2] == 1.0
    assert abs(m[2, 3] - 0.5) < 1e-6 and abs(m[2, 4] - 0.5) < 1e-6
    assert m[3, EOS_ID] == 1.0


def test_uni_beam_size1_matches_greedy():
    rng = jax.random.PRNGKey(0)
    dec = UniDecoder(vocab_size=V, d_model=16, n_layers=1, n_head=2, d_k=8,
                     d_v=8, d_inner=32, dropout=0.0, maxlen=3,
                     tie_embedding=True)
    enc = jax.random.normal(rng, (2, 4, 16))
    labels = jnp.array([[2, 3, -1], [4, -1, -1]], jnp.int32)
    params = dec.init({"params": rng, "dropout": rng}, labels, enc,
                      deterministic=True)
    greedy = dec.apply(params, enc, method=dec.recognize_greedy)

    enc_tiled = jnp.repeat(enc, 1, axis=0)

    def step_fn(ys, step):
        return dec.apply(params, ys, enc_tiled, step, method=dec.step_logits)

    tokens, _ = beam_search(step_fn, enc, beam_size=1, maxlen=3, vocab_size=V)
    beam_best = np.asarray(tokens[:, 0])
    greedy_np = np.asarray(greedy)
    # beam-1 follows the same argmax chain until its first eos; after eos the
    # beam freezes to eos while greedy keeps decoding tokens
    for b in range(2):
        for t in range(1, 4):
            if beam_best[b, t] == EOS_ID:
                break
            assert beam_best[b, t] == greedy_np[b, t]
