"""r5 deploy/layout helpers: const-weights jit + chained in-graph iterations.

`const_weights_jit` bakes the weight pytree into the executable as
compile-time constants (the tunnel-safe replacement for pinned-layout AOT —
deploy/layout.py docstrings); `chain_iters` runs K evaluations per dispatch
for dispatch-overhead-free chip timing. Both must be numerically faithful to
the plain-jit reference on iteration 0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from yololite_tpu.deploy.layout import chain_iters, const_weights_jit


def _fn(variables, x):
    w = variables["params"]["w"]
    b = variables["params"]["b"]
    return jnp.tanh(x @ w + b)


def _setup():
    rng = np.random.RandomState(0)
    variables = {"params": {"w": jnp.asarray(rng.randn(8, 4), jnp.float32),
                            "b": jnp.asarray(rng.randn(4), jnp.float32)}}
    x = jnp.asarray(rng.randn(3, 8), jnp.float32)
    return variables, x


def test_const_weights_jit_matches_plain_jit():
    variables, x = _setup()
    ref = jax.jit(_fn)(variables, x)
    got = const_weights_jit(_fn, variables)(x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


def test_const_weights_jit_accepts_numpy_weights():
    variables, x = _setup()
    np_vars = jax.tree.map(np.asarray, variables)
    got = const_weights_jit(_fn, np_vars)(x)
    ref = _fn(variables, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


def test_chain_iters_runs_and_first_iter_faithful():
    """chain_iters(fn, v, 1) == fn(v, x) exactly (no perturbation applied);
    K>1 perturbs the input between iterations (timing harness — outputs of
    later iterations are deliberately not meaningful) but must still execute
    and return the last iteration's output shape/dtype."""
    variables, x = _setup()
    ref = _fn(variables, x)
    one = chain_iters(_fn, variables, 1)(x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(one), atol=1e-6)

    out = chain_iters(_fn, variables, 5)(x)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    assert np.all(np.isfinite(np.asarray(out)))


def test_chain_iters_uint8_input():
    """Deploy graphs consume uint8 (s2d-packed) images — the perturbation adds
    a uint8 scalar with wraparound; shape/dtype must be preserved."""
    variables = {"params": {"w": jnp.asarray(
        np.random.RandomState(1).randn(6, 2), jnp.float32)}}

    def fn(v, x):
        return (x.astype(jnp.float32) / 255.0) @ v["params"]["w"]

    x = jnp.asarray((np.random.RandomState(2).rand(4, 6) * 255),
                    jnp.uint8)
    out = chain_iters(fn, variables, 3)(x)
    assert out.shape == (4, 2)
    assert np.all(np.isfinite(np.asarray(out)))
