import jax.numpy as jnp
import numpy as np

from sbl_for_multilingual_lip_reading_tpu.training import (
    cal_performance, label_smoothed_ce, noam_schedule)
from sbl_for_multilingual_lip_reading_tpu.utils import (
    levenshtein, wer_compute, per_compute, AverageMeter, topk_accuracy)
from sbl_for_multilingual_lip_reading_tpu.vocab import IGNORE_ID


def _reference_smoothed_ce(pred, gold, eps):
    """Independent numpy port of the reference loss formula
    (transformer/loss.py:27-52): one-hot*(1-eps) + (1-one_hot)*eps/C,
    mean of -sum(target*logp) over non-IGNORE tokens."""
    pred = pred.reshape(-1, pred.shape[-1]).astype(np.float64)
    gold = gold.reshape(-1)
    C = pred.shape[1]
    logp = pred - pred.max(1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(1, keepdims=True))
    mask = gold != IGNORE_ID
    safe = np.where(mask, gold, 0)
    one_hot = np.eye(C)[safe]
    tgt = one_hot * (1 - eps) + (1 - one_hot) * eps / C
    loss = -(tgt * logp).sum(1)
    return loss[mask].sum() / mask.sum()


def test_smoothed_ce_matches_reference_formula():
    rng = np.random.RandomState(0)
    pred = rng.randn(4, 6, 10).astype(np.float32)
    gold = rng.randint(0, 10, size=(4, 6))
    gold[:, 4:] = IGNORE_ID
    for eps in (0.0, 0.1):
        ours = float(label_smoothed_ce(jnp.asarray(pred), jnp.asarray(gold), eps))
        ref = _reference_smoothed_ce(pred, gold, eps)
        assert abs(ours - ref) < 1e-5, (eps, ours, ref)


def test_cal_performance_counts_correct():
    pred = np.full((2, 3, 5), -10.0, np.float32)
    gold = np.array([[1, 2, IGNORE_ID], [3, 3, 3]])
    # make argmax == gold at (0,0), (1,0), (1,2); (0,2) is ignored
    pred[0, 0, 1] = 10.0
    pred[1, 0, 3] = 10.0
    pred[1, 2, 3] = 10.0
    pred[0, 2, 2] = 10.0  # would match the IGNORE slot; must not count
    loss, n_correct = cal_performance(jnp.asarray(pred), jnp.asarray(gold), 0.1)
    assert int(n_correct) == 3
    assert np.isfinite(float(loss))


def test_noam_schedule_values():
    sched = noam_schedule(k=0.2, warmup_steps=4000, d_model=512)
    # reference: lr = k * d^-0.5 * min(s^-0.5, s * warmup^-1.5), s from 1
    for step0, s in [(0, 1), (3999, 4000), (9999, 10000)]:
        expect = 0.2 * 512 ** -0.5 * min(s ** -0.5, s * 4000 ** -1.5)
        got = float(sched(jnp.asarray(step0)))
        assert abs(got - expect) / expect < 1e-6
    # peak at warmup
    peak = float(sched(jnp.asarray(3999)))
    assert peak > float(sched(jnp.asarray(100)))
    assert peak > float(sched(jnp.asarray(20000)))


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein([], [1, 2]) == 2
    assert levenshtein([1, 2, 3], [1, 2, 3]) == 0
    assert levenshtein(["a", "b"], ["b"]) == 1


def test_wer_per():
    # joined phoneme strings -> single-"word" sequences: exact-match rate
    assert wer_compute(["abc", "abd"], ["abc", "abc"]) == 0.5
    assert per_compute([["a", "b"], ["a"]], [["a", "b"], ["a", "b"]]) == 0.25


def test_meters_and_topk():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.val == 3.0
    scores = np.array([[0.1, 0.9], [0.8, 0.2]])
    assert topk_accuracy(scores, np.array([1, 1]), k=1) == 50.0
    assert topk_accuracy(scores, np.array([1, 1]), k=2) == 100.0


def test_classify_loss_ignores_unknown_word_sentinel():
    """word_class_id returns -1 for unknown words; those samples must be
    excluded from loss/accuracy, not wrapped to the last class by
    take_along_axis."""
    import jax.numpy as jnp
    from sbl_for_multilingual_lip_reading_tpu.training.loss import (
        classify_loss)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 10)), jnp.float32)
    lang_logits = jnp.asarray(rng.standard_normal((4, 2)), jnp.float32)
    lang = jnp.asarray([0, 1, 0, 1], jnp.int32)
    labels = jnp.asarray([3, -1, 5, -1], jnp.int32)
    loss_m, w_ok, _ = classify_loss(logits, labels, lang_logits, lang)
    # identical to dropping the sentinel rows entirely
    keep = jnp.asarray([0, 2])
    loss_k, w_ok_k, _ = classify_loss(
        logits[keep], labels[keep], lang_logits, lang)
    np.testing.assert_allclose(float(loss_m) - float(loss_k), 0.0, atol=2e-6)
    assert int(w_ok) == int(w_ok_k) <= 2
    # and a label of -1 never counts as correct even if class C-1 is argmax
    logits9 = jnp.zeros((1, 10)).at[0, 9].set(5.0)
    _, w_ok2, _ = classify_loss(logits9, jnp.asarray([-1]),
                                jnp.zeros((1, 2)), jnp.asarray([0]))
    assert int(w_ok2) == 0
