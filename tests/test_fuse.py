import jax
import jax.numpy as jnp
import numpy as np

from tmae_tpu.models.layers import ConvBNReLU, LinearBNReLU
from tmae_tpu.utils.fuse import fuse_conv_bn


def _trained_variables(model, init_args, train_args, n_steps=3):
    v = model.init(jax.random.PRNGKey(0), *init_args)
    state = v
    for _ in range(n_steps):  # move the running stats off their init values
        _, mut = model.apply(state, *train_args, mutable=['batch_stats'])
        state = {'params': state['params'], 'batch_stats': mut['batch_stats']}
    return state


def test_fuse_conv_bn_relu_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    m = ConvBNReLU(6)
    v = _trained_variables(m, (x, True), (x, True))
    ref = m.apply(v, x, False)
    fp, fs = fuse_conv_bn(v['params'], v['batch_stats'])
    out = m.apply({'params': fp, 'batch_stats': fs}, x, False)
    # the conv computes in bf16, so pre-scaling the kernel vs post-scaling
    # the activations differ at bf16 rounding level
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    # BN is now the identity-with-bias form
    bn = fs['BatchNorm2d_0']['BatchNorm_0']
    assert np.allclose(bn['mean'], 0)


def test_fuse_linear_bn_relu_exact():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 4).astype(np.float32))
    mask = jnp.ones((2, 16), bool)
    m = LinearBNReLU(8)
    v = _trained_variables(m, (x, mask, True), (x, mask, True))
    ref = m.apply(v, x, mask, False)
    fp, fs = fuse_conv_bn(v['params'], v['batch_stats'])
    out = m.apply({'params': fp, 'batch_stats': fs}, x, mask, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
