"""Fused Pallas BasicBlock kernel (ops/resblock.py) vs the module path."""
import jax
import jax.numpy as jnp
import numpy as np

from sbl_for_multilingual_lip_reading_tpu.ops.resblock import (fold_bn,
                                                               fused_resblock)


def _reference_block(x, w1, a1, b1, w2, a2, b2):
    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
    h = jnp.maximum(conv(x.astype(jnp.float32), w1.astype(jnp.float32))
                    * a1 + b1, 0.0)
    y = conv(h, w2.astype(jnp.float32)) * a2 + b2 + x.astype(jnp.float32)
    return jnp.maximum(y, 0.0)


def test_fused_resblock_matches_conv_reference():
    rng = jax.random.PRNGKey(0)
    for N, S, C in ((4, 10, 16), (8, 7, 8)):
        ks = jax.random.split(jax.random.fold_in(rng, S), 7)
        x = jax.random.normal(ks[0], (N, S, S, C))
        w1 = jax.random.normal(ks[1], (3, 3, C, C)) * 0.2
        w2 = jax.random.normal(ks[2], (3, 3, C, C)) * 0.2
        a1 = jax.random.uniform(ks[3], (C,), minval=0.5, maxval=1.5)
        b1 = jax.random.normal(ks[4], (C,)) * 0.1
        a2 = jax.random.uniform(ks[5], (C,), minval=0.5, maxval=1.5)
        b2 = jax.random.normal(ks[6], (C,)) * 0.1
        out = fused_resblock(x, w1, a1, b1, w2, a2, b2, interpret=True)
        expect = _reference_block(x, w1, a1, b1, w2, a2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-4, rtol=1e-4)


def test_fold_bn_matches_batchnorm_eval():
    rng = jax.random.PRNGKey(1)
    C = 8
    scale = jax.random.uniform(rng, (C,), minval=0.5, maxval=1.5)
    bias = jax.random.normal(jax.random.fold_in(rng, 1), (C,))
    mean = jax.random.normal(jax.random.fold_in(rng, 2), (C,))
    var = jax.random.uniform(jax.random.fold_in(rng, 3), (C,),
                             minval=0.1, maxval=2.0)
    x = jax.random.normal(jax.random.fold_in(rng, 4), (5, C))
    a, b = fold_bn(scale, bias, mean, var, 1e-5)
    expect = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(np.asarray(x * a + b), np.asarray(expect),
                               atol=1e-5)


def test_basic_block_fused_eval_matches_module():
    """The BasicBlock fused eval path == the module path with trained-ish
    (randomized) running statistics, and training still uses the module
    path (batch-stat mutation)."""
    from sbl_for_multilingual_lip_reading_tpu.models.frontend import (
        BasicBlock)
    rng = jax.random.PRNGKey(2)
    N, S, C = 4, 8, 16
    x = jax.random.normal(rng, (N, S, S, C))
    block = BasicBlock(filters=C, stride=1, use_pallas_resblock=True,
                       fused_interpret=True)
    ref_block = BasicBlock(filters=C, stride=1, use_pallas_resblock=False)
    variables = block.init(jax.random.PRNGKey(3), x, False)
    # randomize running stats so the BN affine is non-trivial
    bs = jax.tree_util.tree_map(
        lambda v: v + 0.3 * jax.random.normal(
            jax.random.PRNGKey(v.size), v.shape) ** 2,
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    out = block.apply(variables, x, False)
    expect = ref_block.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-4, rtol=1e-4)
    # train path must still mutate batch stats (module path)
    _, mut = block.apply(variables, x, True, mutable=["batch_stats"])
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(mut["batch_stats"])[0]),
        np.asarray(jax.tree_util.tree_leaves(bs)[0]))
