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


def test_sbl_beam_argmax_paths_and_scores():
    """Prefix-independent paired logits: the optimal pair is each
    direction's argmax chain and the joint score is the sum of both
    directions' log-softmax maxima."""
    from sbl_for_multilingual_lip_reading_tpu.decode import sbl_beam_search
    maxlen = 4
    rng = np.random.RandomState(1)
    lg_l = jnp.asarray(rng.randn(maxlen, V).astype(np.float32))
    lg_r = jnp.asarray(rng.randn(maxlen, V).astype(np.float32))

    def step_fn(ys_l, ys_r, step):
        N = ys_l.shape[0]
        return (jnp.broadcast_to(lg_l[step], (N, V)),
                jnp.broadcast_to(lg_r[step], (N, V)))

    tok_l, tok_r, scores = sbl_beam_search(step_fn, 2, 3, maxlen, V)
    assert tok_l.shape == tok_r.shape == (2, 3, maxlen + 1)
    np.testing.assert_array_equal(np.asarray(tok_l[0, 0, 1:]),
                                  np.argmax(np.asarray(lg_l), -1))
    np.testing.assert_array_equal(np.asarray(tok_r[0, 0, 1:]),
                                  np.argmax(np.asarray(lg_r), -1))
    s = np.asarray(scores[0])
    assert np.all(np.diff(s) <= 1e-6)  # sorted descending
    expect = (float(jnp.sum(jnp.max(jax.nn.log_softmax(lg_l, -1), -1)))
              + float(jnp.sum(jnp.max(jax.nn.log_softmax(lg_r, -1), -1))))
    assert abs(float(scores[0, 0]) - expect) < 1e-4


def test_sbl_beam_per_direction_eos_freeze():
    """A direction that emitted eos extends only with eos at zero cost
    while the other direction keeps decoding."""
    from sbl_for_multilingual_lip_reading_tpu.decode import sbl_beam_search
    maxlen = 4
    lg_l = np.full((maxlen, V), -5.0, np.float32)
    lg_l[0, EOS_ID] = 10.0          # l2r finishes at step 0
    lg_l[1:, 3] = 5.0               # tempting non-eos continuation
    lg_r = np.full((maxlen, V), -5.0, np.float32)
    lg_r[:, 4] = 5.0                # r2l never finishes

    def step_fn(ys_l, ys_r, step):
        N = ys_l.shape[0]
        return (jnp.broadcast_to(jnp.asarray(lg_l)[step], (N, V)),
                jnp.broadcast_to(jnp.asarray(lg_r)[step], (N, V)))

    tok_l, tok_r, scores = sbl_beam_search(step_fn, 1, 2, maxlen, V)
    best_l = np.asarray(tok_l[0, 0])
    np.testing.assert_array_equal(best_l[1:], EOS_ID)
    np.testing.assert_array_equal(np.asarray(tok_r[0, 0, 1:]), 4)


def test_sbl_beam_size1_matches_greedy_recognize():
    """beam=1 must reproduce the synchronous greedy decode token-for-token
    until each direction's first eos (after which the beam freezes while
    the reference-greedy keeps emitting argmax tokens)."""
    from sbl_for_multilingual_lip_reading_tpu.decode import sbl_beam_search
    from sbl_for_multilingual_lip_reading_tpu.models.decoder_sbl import (
        SBLDecoder)
    rng = jax.random.PRNGKey(2)
    maxlen = 5
    dec = SBLDecoder(vocab_size=V, d_model=16, n_layers=2, n_head=2, d_k=8,
                     d_v=8, d_inner=32, dropout=0.0, maxlen=maxlen,
                     decode_segments=1)
    enc = jax.random.normal(rng, (2, 4, 16))
    labels = jnp.array([[2, 3, -1], [4, 2, -1]], jnp.int32)
    params = dec.init({"params": rng, "dropout": rng, "teacher": rng},
                      labels, labels, enc, deterministic=True)
    g_l2r, g_r2l = dec.apply(params, enc, method=dec.recognize)
    enc_kv = dec.apply(params, jnp.repeat(enc, 1, axis=0),
                       method=dec.compute_cross_kv)

    def step_fn(ys_l, ys_r, step):
        return dec.apply(params, ys_l, ys_r, enc_kv, step,
                         method=dec.step_logits_cached)

    tok_l, tok_r, _ = sbl_beam_search(step_fn, 2, 1, maxlen, V)
    for greedy, beam in ((np.asarray(g_l2r), np.asarray(tok_l[:, 0])),
                         (np.asarray(g_r2l), np.asarray(tok_r[:, 0]))):
        for b in range(2):
            for t in range(1, maxlen + 1):
                if beam[b, t] == EOS_ID:
                    break
                assert beam[b, t] == greedy[b, t]


def test_sbl_beam_decoder_end_to_end():
    """make_sbl_beam_decoder on a full tiny SBLTransformer + the Trainer
    eval path with beam_size."""
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.data import SyntheticLipDataset
    from sbl_for_multilingual_lip_reading_tpu.decode import (
        make_sbl_beam_decoder)
    from sbl_for_multilingual_lip_reading_tpu.training import Trainer
    cfg = C.tiny_test("sbl")
    ds = SyntheticLipDataset(size=4, frames=cfg.data.frames,
                             raw_size=cfg.data.raw_size)
    tr = Trainer(cfg, ds)
    fn = make_sbl_beam_decoder(tr.model, beam_size=3)
    video = jnp.zeros((2, cfg.data.frames, cfg.data.crop_size,
                       cfg.data.crop_size), jnp.float32)
    variables = {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats}
    tok_l, tok_r, scores = fn(variables, video)
    L = cfg.decoder.maxlen + 1
    assert tok_l.shape == tok_r.shape == (2, 3, L)
    assert scores.shape == (2, 3)
    assert np.all(np.diff(np.asarray(scores), axis=1) <= 1e-6)
    np.testing.assert_array_equal(np.asarray(tok_l[:, :, 0]), SOS_ID)
    # Trainer eval plumbing: bidi + beam_size
    out = tr.validate_seq2seq(ds, max_batches=1, beam_size=2)
    assert set(out) == {"l2r_wer", "l2r_per", "r2l_wer", "r2l_per"}


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


def test_uni_beam_cached_token_identical():
    """KV-cached beam == full-prefix beam on a full tiny UniTransformer,
    with and without a bigram bias."""
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.data import SyntheticLipDataset
    from sbl_for_multilingual_lip_reading_tpu.decode import (
        make_uni_beam_decoder)
    from sbl_for_multilingual_lip_reading_tpu.training import Trainer
    cfg = C.tiny_test("lrw1000")
    ds = SyntheticLipDataset(size=4, frames=cfg.data.frames,
                             raw_size=cfg.data.raw_size, vocab="lrw1000")
    tr = Trainer(cfg, ds)
    variables = {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats}
    video = jax.random.normal(
        jax.random.PRNGKey(3),
        (2, cfg.data.frames, cfg.data.crop_size, cfg.data.crop_size))
    rng = np.random.default_rng(0)
    bigram = jnp.asarray(np.log(rng.random(
        (cfg.decoder.vocab_size, cfg.decoder.vocab_size)) + 0.1))
    for bg in (None, bigram):
        ref_fn = make_uni_beam_decoder(tr.model, beam_size=3, bigram_logp=bg,
                                       kv_cache=False)
        kv_fn = make_uni_beam_decoder(tr.model, beam_size=3, bigram_logp=bg)
        tok_ref, sc_ref = ref_fn(variables, video)
        tok_kv, sc_kv = kv_fn(variables, video)
        np.testing.assert_array_equal(np.asarray(tok_kv), np.asarray(tok_ref))
        np.testing.assert_allclose(np.asarray(sc_kv), np.asarray(sc_ref),
                                   atol=1e-4)
